"""Perplexity tool tests: the windowed NLL must equal a direct computation."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGMLType
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.perplexity import compute_kld, compute_perplexity, log_softmax_rows


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = tmp_path_factory.mktemp("ppl") / "tiny.gguf"
    make_tiny_llama_gguf(path, quant_type=GGMLType.F32, n_ctx=128)
    model = load_model(str(path), mode="dequant", dtype=jnp.float32)
    engine = Engine(model.params, model.config, max_seq=128, dtype=jnp.float32)
    return model, engine


def test_perplexity_matches_manual(setup):
    model, engine = setup
    text = "hello world, this is a test of perplexity computation" * 4
    n_ctx = 32
    ppl, mean, err, count = compute_perplexity(
        engine, model.tokenizer, model.vocab, text, n_ctx=n_ctx
    )
    assert np.isfinite(ppl) and ppl > 0
    # manual recomputation of chunk 0
    tokens = model.tokenizer.tokenize(text, add_special=False)
    chunk = list(tokens[:n_ctx])
    chunk[0] = model.vocab.bos_id
    engine.clear_row(0)
    logits = engine.prefill_logits(chunk)
    first = n_ctx // 2
    lp = log_softmax_rows(logits[first : n_ctx - 1].astype(np.float64))
    targets = np.array(chunk[first + 1 :])
    manual_nll = -lp[np.arange(len(targets)), targets].sum()
    n_chunks = len(tokens) // n_ctx
    assert count == n_chunks * (n_ctx - 1 - first)
    # chunk-0 contribution should appear in total
    assert manual_nll / count <= mean * n_chunks + 1e-6


def test_prefill_logits_consistent_with_prefill(setup):
    model, engine = setup
    ids = [1, 5, 9, 13]
    engine.clear_row(0)
    all_logits = engine.prefill_logits(ids)
    engine.clear_row(0)
    last = engine.prefill(ids)
    np.testing.assert_allclose(all_logits[-1], last, rtol=1e-5, atol=1e-5)


def test_kld_zero_for_identical():
    lp = log_softmax_rows(np.random.default_rng(0).standard_normal((10, 50)))
    r = compute_kld(lp, lp)
    assert abs(r["kld_mean"]) < 1e-9
    assert r["same_top_p"] == 1.0


def test_kld_positive_for_different():
    rng = np.random.default_rng(0)
    a = log_softmax_rows(rng.standard_normal((10, 50)))
    b = log_softmax_rows(rng.standard_normal((10, 50)))
    r = compute_kld(a, b)
    assert r["kld_mean"] > 0.1


def _brute_ending_scores(engine, seqs, prefix):
    """Independent full-prefill computation of the reference's mean ending
    log-prob (first ending token scored at the prefix's last position)."""
    out = []
    for s in seqs:
        engine.clear_row(0)
        lp = log_softmax_rows(
            np.asarray(engine.prefill_logits(list(s)), np.float64))
        total = sum(lp[j][s[j + 1]] for j in range(prefix - 1, len(s) - 1))
        out.append(total / (len(s) - prefix))
    return out


def test_hellaswag_scoring_matches_bruteforce(setup):
    from llamacog_tpu.tools.perplexity import (
        _common_prefix, _score_endings, score_hellaswag)

    model, engine = setup
    ctxs = ["the cat sat on", "every morning she goes"]
    endings = [["the mat quietly", "a rocket to mars", "fire and water", "it"],
               ["to the gym", "backwards in time", "blue seven", "home now"]]
    # golds chosen by brute force so the scorer must get 100% accuracy
    lines = []
    for ctx, ends in zip(ctxs, endings):
        seqs = [model.tokenizer.tokenize(ctx + " " + e, add_special=True)
                for e in ends]
        prefix = _common_prefix(seqs)
        brute = _brute_ending_scores(engine, seqs, max(prefix, 1))
        fast = _score_endings(engine, seqs, prefix)
        np.testing.assert_allclose(fast, brute, rtol=1e-4, atol=1e-5)
        lines += [ctx, str(int(np.argmax(brute)))] + ends
    res = score_hellaswag(engine, model.tokenizer, "\n".join(lines))
    assert res["tasks"] == 2 and res["hellaswag_acc"] == 100.0


def test_winogrande_scoring(setup):
    from llamacog_tpu.tools.perplexity import (
        _parse_winogrande_csv, score_winogrande)

    model, engine = setup
    csv_text = (
        '0,"Sarah was a much better surgeon than Maria so _ always got the '
        'harder cases.",Sarah,Maria,1\n'
        "1,the dog chased the cat because _ was angry.,the dog,the cat,1\n"
    )
    tasks = _parse_winogrande_csv(csv_text)
    assert len(tasks) == 2
    assert tasks[0]["choices"] == ["Sarah", "Maria"] and tasks[0]["answer"] == 1
    assert tasks[0]["first"].endswith("so ")
    res = score_winogrande(engine, model.tokenizer, csv_text)
    assert res["tasks"] == 2 and 0.0 <= res["winogrande_acc"] <= 100.0


def test_multiple_choice_scoring(setup):
    import json as _json

    from llamacog_tpu.tools.perplexity import (
        _common_prefix, score_multiple_choice)

    model, engine = setup
    q = "Q: what color is the sky? A:"
    answers = ["blue", "seven", "running", "cheese sandwich"]
    seqs = [model.tokenizer.tokenize(q + " " + a, add_special=True)
            for a in answers]
    brute = _brute_ending_scores(
        engine, seqs, max(_common_prefix(seqs), 1))
    gold = int(np.argmax(brute))
    text = _json.dumps({"question": q, "answers": answers, "label": gold})
    res = score_multiple_choice(engine, model.tokenizer, text)
    assert res["tasks"] == 1 and res["multiple_choice_acc"] == 100.0
