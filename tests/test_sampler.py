"""Sampler tests (role of reference tests/test-sampling.cpp)."""

import numpy as np

from llamacog_tpu.runtime.sampler import SamplerChain, SamplerParams, _softmax


def chain(**kw):
    defaults = dict(temp=1.0, top_k=0, top_p=1.0, min_p=0.0)
    defaults.update(kw)
    return SamplerChain(SamplerParams(**defaults), n_vocab=8)


def test_greedy():
    c = chain(temp=0.0)
    logits = np.array([0.1, 3.0, 0.2, -1.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    assert c.sample(logits) == 1


def test_top_k():
    logits = np.log(np.array([0.1, 0.2, 0.3, 0.4, 1e-9, 1e-9, 1e-9, 1e-9], np.float32))
    out = SamplerChain.top_k_mask(logits.copy(), 2)
    kept = np.where(np.isfinite(out))[0]
    assert set(kept) == {2, 3}


def test_top_p():
    probs = np.array([0.4, 0.3, 0.2, 0.1, 1e-9, 1e-9, 1e-9, 1e-9], np.float32)
    logits = np.log(probs / probs.sum())
    out = SamplerChain.top_p_mask(logits.copy(), 0.7)
    kept = set(np.where(np.isfinite(out))[0])
    assert kept == {0, 1}
    out = SamplerChain.top_p_mask(logits.copy(), 0.71)
    assert set(np.where(np.isfinite(out))[0]) == {0, 1, 2}


def test_min_p():
    probs = np.array([0.5, 0.25, 0.2, 0.05, 1e-9, 1e-9, 1e-9, 1e-9], np.float32)
    logits = np.log(probs)
    out = SamplerChain.min_p_mask(logits.copy(), 0.3)  # keep p >= 0.15
    kept = set(np.where(np.isfinite(out))[0])
    assert kept == {0, 1, 2}


def test_typical():
    probs = np.array([0.97, 0.01, 0.01, 0.01, 1e-9, 1e-9, 1e-9, 1e-9], np.float32)
    logits = np.log(probs / probs.sum())
    out = SamplerChain.typical_mask(logits.copy(), 0.5)
    assert np.isfinite(out[0])


def test_penalties():
    c = chain(penalty_repeat=2.0, penalty_last_n=8)
    for _ in range(3):
        c.accept(2)
    logits = np.zeros(8, np.float32)
    logits[2] = 4.0
    c.p.temp = 0.0
    # token 2 logit 4.0 -> /2 = 2.0 still max; with stronger penalty it flips
    assert c.sample(logits) == 2
    c2 = chain(penalty_repeat=100.0, penalty_last_n=8, temp=0.0)
    c2.accept(2)
    logits = np.zeros(8, np.float32)
    logits[2] = 4.0
    logits[5] = 1.0
    assert c2.sample(logits) == 5


def test_dist_seeded_reproducible():
    c1 = chain(seed=42)
    c2 = chain(seed=42)
    logits = np.random.default_rng(0).standard_normal(8).astype(np.float32)
    s1 = [c1.sample(logits) for _ in range(20)]
    s2 = [c2.sample(logits) for _ in range(20)]
    assert s1 == s2


def test_dist_statistics():
    # sampling follows softmax probabilities
    c = chain(seed=1)
    probs = np.array([0.7, 0.2, 0.1, 1e-9, 1e-9, 1e-9, 1e-9, 1e-9], np.float32)
    logits = np.log(probs)
    draws = np.array([c.sample(logits) for _ in range(2000)])
    freq = np.bincount(draws, minlength=8) / len(draws)
    assert abs(freq[0] - 0.7) < 0.05
    assert abs(freq[1] - 0.2) < 0.05


def test_xtc_removes_high_prob():
    c = chain(xtc_probability=1.0, xtc_threshold=0.2, seed=3, temp=1.0)
    probs = np.array([0.5, 0.3, 0.1, 0.1, 1e-9, 1e-9, 1e-9, 1e-9], np.float32)
    logits = np.log(probs)
    draws = {c.sample(logits) for _ in range(50)}
    assert 0 not in draws  # most-probable above-threshold token removed


def test_mirostat_v2_runs():
    c = chain(mirostat=2, temp=1.0, seed=7)
    logits = np.random.default_rng(0).standard_normal(8).astype(np.float32)
    toks = [c.sample(logits) for _ in range(10)]
    assert all(0 <= t < 8 for t in toks)


def test_top_n_sigma():
    c = chain(top_n_sigma=1.0, temp=1.0, seed=5)
    logits = np.array([10.0, 9.9, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    draws = {c.sample(logits) for _ in range(50)}
    assert draws <= {0, 1}


def test_dry_penalizes_repetition():
    from llamacog_tpu.runtime.sampler import SamplerChain, SamplerParams

    p = SamplerParams(temp=0.0, dry_multiplier=2.0, dry_base=1.75,
                      dry_allowed_length=2)
    chain = SamplerChain(p, n_vocab=16)
    # context: 1 2 3 1 2 3 1 2 — next token 3 would extend a repeat of len >= 2
    for t in [1, 2, 3, 1, 2, 3, 1, 2]:
        chain.accept(t)
    logits = np.zeros(16, np.float32)
    logits_before = logits.copy()
    chain._apply_dry(logits)
    assert logits[3] < logits_before[3]  # 3 extends the repeated suffix
    assert logits[7] == logits_before[7]  # unrelated token untouched


def test_dry_respects_sequence_breaker():
    from llamacog_tpu.runtime.sampler import SamplerChain, SamplerParams

    p = SamplerParams(temp=0.0, dry_multiplier=2.0, dry_allowed_length=2,
                      dry_sequence_breakers=(9,))
    chain = SamplerChain(p, n_vocab=16)
    for t in [1, 2, 3, 1, 2, 3, 9, 2]:  # breaker one token back
        chain.accept(t)
    logits = np.zeros(16, np.float32)
    chain._apply_dry(logits)
    # rep_limit (1) < allowed_length (2): nothing penalized
    np.testing.assert_array_equal(logits, np.zeros(16, np.float32))


def test_dry_disabled_is_noop():
    from llamacog_tpu.runtime.sampler import SamplerChain, SamplerParams

    chain = SamplerChain(SamplerParams(dry_multiplier=0.0), n_vocab=8)
    for t in [1, 1, 1, 1]:
        chain.accept(t)
    logits = np.ones(8, np.float32)
    chain._apply_dry(logits)
    np.testing.assert_array_equal(logits, np.ones(8, np.float32))


def test_mirostat_v1():
    """Mirostat v1 (llama_sampler_mirostat): adaptive k from the estimated
    Zipf exponent; mu tracks the target surprise."""
    p = SamplerParams(mirostat=1, mirostat_tau=4.0, mirostat_eta=0.2,
                      temp=1.0, seed=11)
    chain = SamplerChain(p, n_vocab=256)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(256).astype(np.float32) * 2
    mu0 = chain.mu
    assert mu0 == 8.0  # 2 * tau
    toks = [chain.sample(logits) for _ in range(30)]
    assert all(0 <= t < 256 for t in toks)
    assert chain.mu != mu0  # state adapted
    # mu converges toward the configured surprise target: the running
    # average surprise should land near tau
    probs = np.exp(logits - logits.max()); probs /= probs.sum()
    surprises = [-np.log2(probs[t] + 1e-20) for t in toks[10:]]
    assert abs(np.mean(surprises) - 4.0) < 3.0
