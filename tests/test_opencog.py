"""OpenCog QAT sidecar tests (role of reference tests/test-opencog-qat.cpp
and tests/test-triadic-architecture.cpp)."""

import numpy as np

from llamacog_tpu.opencog import (
    AtomSpaceQuantizer,
    ECANQuantizer,
    ExtendedAtomSpace,
    HardwareConstraints,
    HypergraphUtils,
    MOSESQuantizer,
    OpenCogQATFramework,
    QATConfig,
    TruthValue,
)


def _make_space():
    s = ExtendedAtomSpace()
    cat = s.add_node("ConceptNode", "cat", TruthValue(0.9, 0.8))
    animal = s.add_node("ConceptNode", "animal", TruthValue(0.95, 0.9))
    mammal = s.add_node("ConceptNode", "mammal")
    s.add_link("InheritanceLink", [cat, mammal], TruthValue(0.98, 0.9))
    s.add_link("InheritanceLink", [mammal, animal], TruthValue(0.99, 0.95))
    return s, cat, animal, mammal


def test_atomspace_basics():
    s, cat, animal, mammal = _make_space()
    assert len(s) == 5
    # dedup on re-add, truth merge
    again = s.add_node("ConceptNode", "cat", TruthValue(0.5, 0.5, count=1.0))
    assert again.id == cat.id and len(s) == 5
    assert 0.5 < again.tv.strength < 0.9
    # pattern queries
    links = s.query(type="InheritanceLink")
    assert len(links) == 2
    assert s.query(type="InheritanceLink", targets=[cat.id, None])[0].outgoing == (
        cat.id, mammal.id
    )
    # incoming index
    assert len(s.incoming(mammal)) == 2
    # removal refuses while referenced, recursive works
    assert not s.remove(mammal.id)
    assert s.remove(mammal.id, recursive=True)
    assert s.node("ConceptNode", "mammal") is None


def test_hypergraph_utils():
    s, cat, animal, mammal = _make_space()
    order = HypergraphUtils.bfs(s, cat)
    assert len(order) == 5  # fully connected through links
    cent = HypergraphUtils.degree_centrality(s)
    assert cent[mammal.id] >= cent[animal.id]
    comps = HypergraphUtils.connected_components(s)
    assert len(comps) == 1
    lonely = s.add_node("ConceptNode", "island")
    assert len(HypergraphUtils.connected_components(s)) == 2
    assert lonely.id is not None


def test_attention_allocation():
    s, cat, animal, mammal = _make_space()
    link = s.query(type="InheritanceLink", targets=[cat.id, None])[0]
    s.stimulate(link, 100.0)
    s.spread_attention()
    assert s.get(cat.id).sti > 0  # attention spread to targets
    focus = s.attentional_focus(2)
    assert link in focus or s.get(cat.id) in focus


def test_atomspace_serialization_roundtrip():
    s, cat, *_ = _make_space()
    s2 = ExtendedAtomSpace.from_json(s.to_json())
    assert len(s2) == len(s)
    assert s2.node("ConceptNode", "cat").tv.strength == cat.tv.strength
    assert len(s2.query(type="InheritanceLink")) == 2


def test_truth_value_quantizer():
    rng = np.random.default_rng(0)
    tvs = [TruthValue(float(a), float(b), float(c))
           for a, b, c in zip(rng.random(100), rng.random(100), rng.random(100) * 500)]
    qz = AtomSpaceQuantizer()
    qz.calibrate(tvs)
    deq = qz.dequantize(qz.quantize(tvs))
    err_s = max(abs(a.strength - b.strength) for a, b in zip(tvs, deq))
    err_c = max(abs(a.count - b.count) for a, b in zip(tvs, deq))
    assert err_s < 1.0 / 255 + 1e-6  # 8-bit uniform bound
    assert err_c < 500 / 255 + 1e-3


def test_moses_quantizer_preserves_programs():
    prog = [("if", 0.0), ("gt", 0.0), ("var", 1.0), ("const", 3.25),
            ("add", 0.0), ("var", 0.0), ("const", -1.5)]
    qz = MOSESQuantizer()
    rt = qz.dequantize_program(qz.quantize_program(prog))
    assert [op for op, _ in rt] == [op for op, _ in prog]
    assert qz.fitness_preserved(prog, rt, tol=0.05)


def test_ecan_quantizer_budget_conserved():
    rng = np.random.default_rng(1)
    sti = rng.uniform(-50, 80, 64)
    lti = rng.uniform(0, 90, 64)
    vlti = rng.random(64) < 0.2
    qz = ECANQuantizer()
    qz.calibrate(sti, lti)
    s2, l2, v2 = qz.dequantize(qz.quantize(sti, lti, vlti))
    np.testing.assert_allclose(s2.sum(), sti.sum(), rtol=1e-5)
    np.testing.assert_array_equal(v2, vlti)
    assert np.abs(l2 - lti).max() < (90 / 255) * 1.01


def test_qat_framework_progressive():
    rng = np.random.default_rng(2)
    tensors = {
        "w_smooth": (rng.standard_normal((64, 256)) * 0.02).astype(np.float32),
        "w_outliers": np.concatenate(
            [rng.standard_normal((63, 256)), 40 * rng.standard_normal((1, 256))]
        ).astype(np.float32),
    }
    fw = OpenCogQATFramework(
        HardwareConstraints(memory_reduction_target=0.5),
        QATConfig(kl_divergence_threshold=0.02),
    )
    m = fw.run(tensors)
    assert m.memory_reduction > 0.5
    assert m.kl_divergence_loss <= 0.02
    assert all(t != "F32" for t in m.per_tensor_types.values())
    assert fw.meets_constraints(m)
