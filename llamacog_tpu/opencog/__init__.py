"""OpenCog QAT sidecar (the fork's delta over upstream llama.cpp).

Python equivalent of /root/reference/src/opencog-qat/ — a standalone
library NOT wired into the inference path (the reference links only
against common; SURVEY §2.10):

* atomspace: ExtendedAtomSpace hypergraph store (nodes/links, extended
  truth values, pattern queries, ECAN attention allocation) + hypergraph
  utilities (traversal, centrality, serialization).
* quantizers: AtomSpace / MOSES / ECAN quantizers (≤8-bit encodings of
  truth values, program trees, attention values).
* qat: OpenCogQATFramework — data-free synthetic calibration, progressive
  quantization with a KL-divergence threshold, hardware constraint targets
  (including TPU, qat-framework.h:19-31).

The triadic "Relevance Realization" reasoning-format (<rr> tags) lives in
runtime/chat.py (COMMON_REASONING_FORMAT_RR).
"""

from .atomspace import ExtendedAtomSpace, HypergraphUtils, TruthValue  # noqa: F401
from .qat import HardwareConstraints, OpenCogQATFramework, QATConfig  # noqa: F401
from .quantizers import (  # noqa: F401
    AtomSpaceQuantizer,
    ECANQuantizer,
    MOSESQuantizer,
)
