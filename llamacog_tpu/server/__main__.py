"""python -m llamacog_tpu.server --model m.gguf [--port 8080]"""

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-server")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--override-kv", action="append", default=[],
                   metavar="KEY=TYPE:VALUE",
                   help="override a GGUF metadata key (types int/float/bool/str)")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("-np", "--n-slots", type=int, default=4)
    p.add_argument("--mode", choices=("quantized", "dequant"), default="quantized")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    p.add_argument("-tp", "--tensor-parallel", type=int, default=1,
                   help="shard weights/KV over N chips (model mesh axis)")
    p.add_argument("-dp", "--data-parallel", type=int, default=1,
                   help="shard request batch over N chip groups")
    p.add_argument("--lora", action="append", default=[], help="LoRA adapter GGUF")
    p.add_argument("--control-vector", default=None, help="control vector GGUF")
    p.add_argument("--control-vector-scale", type=float, default=1.0)
    p.add_argument("--mmproj", default=None, help="vision mmproj GGUF (multimodal)")
    p.add_argument("-md", "--model-draft", default=None,
                   help="draft model GGUF for per-slot speculative decoding")
    p.add_argument("--spec-ondevice", type=int, default=0, metavar="N",
                   help="on-device speculative decoding (draft+verify fused "
                   "in one jit; greedy requests only, requires -np 1). "
                   "Draft = -md model if given, else the target's first N "
                   "layers (self-speculative truncated draft)")
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per on-device speculative round")
    p.add_argument("--no-context-shift", action="store_true",
                   help="finish a slot when its context fills instead of shifting")
    _KV_TYPES = ("f16", "bf16", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1")
    p.add_argument("-ctk", "--cache-type-k",
                   choices=_KV_TYPES,
                   default="bf16", help="K cache type (q8_0 halves KV HBM, "
                   "q4_0 quarters it; "
                   "the flash kernels read it directly)")
    p.add_argument("-ctv", "--cache-type-v",
                   choices=_KV_TYPES, default=None,
                   help="V cache type (defaults to the K type)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port (jax.distributed)")
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    if args.coordinator or args.num_hosts:
        from ..parallel.distributed import init_distributed

        info = init_distributed(args.coordinator, args.num_hosts, args.host_id)
        print(f"[distributed] host {info['host_id']}/{info['hosts']}, "
              f"{info['devices']} devices", flush=True)
    import jax.numpy as jnp

    from ..models.loader import load_model
    from .server import serve

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    from ..models.loader import parse_kv_overrides

    model = load_model(args.model, mode=args.mode, dtype=dtype,
                       kv_overrides=parse_kv_overrides(args.override_kv))
    loras = []
    if args.lora:
        from ..runtime.lora import load_lora

        loras = [load_lora(p) for p in args.lora]
    if args.control_vector:
        from ..runtime.lora import attach_control_vector, load_control_vector

        attach_control_vector(
            model.params, load_control_vector(args.control_vector),
            model.config.n_layer, model.config.n_embd,
            strength=args.control_vector_scale,
        )
    mesh = None
    if args.tensor_parallel > 1 or args.data_parallel > 1:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(args.data_parallel, args.tensor_parallel)
    vision = None
    if args.mmproj:
        from ..mtmd import load_mmproj

        vision = load_mmproj(args.mmproj)
    draft_model = None
    if args.model_draft:
        draft_model = load_model(args.model_draft, mode=args.mode, dtype=dtype)
    kv_type = (args.cache_type_k if args.cache_type_v in (None, args.cache_type_k)
               else f"{args.cache_type_k}:{args.cache_type_v}")
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        # follower host: build the SAME engines (ServerContext without HTTP
        # or the inference thread) and replay the controller's engine calls
        # in lockstep (parallel/mirror.py)
        from ..parallel.mirror import follower_loop
        from ..runtime.engine import Engine
        from .server import ServerContext

        ctx = ServerContext(
            model, n_slots=args.n_slots, ctx_size=args.ctx_size, dtype=dtype,
            loras=loras, mesh=mesh, vision=vision, draft_model=draft_model,
            ctx_shift=not args.no_context_shift, kv_type=kv_type,
        )
        engines = {"main": ctx.engine}
        if draft_model is not None:
            engines["draft"] = ctx.draft_engine
        print(f"[distributed] follower {jax.process_index()} replaying "
              "engine calls", flush=True)
        follower_loop(
            engines,
            lambda **kw: Engine(model.params, model.config, **kw),
        )
        return 0
    ctx, httpd = serve(
        model, host=args.host, port=args.port, n_slots=args.n_slots,
        ctx_size=args.ctx_size, dtype=dtype, loras=loras, mesh=mesh, vision=vision,
        draft_model=draft_model, ctx_shift=not args.no_context_shift,
        kv_type=kv_type, spec_ondevice=args.spec_ondevice, spec_k=args.spec_k,
    )
    print(f"llamacog-server listening on http://{args.host}:{args.port} "
          f"({args.n_slots} slots, ctx {args.ctx_size})", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        ctx.stop()
        if jax.process_count() > 1:
            from ..parallel.mirror import stop_followers

            stop_followers()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
