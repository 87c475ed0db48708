"""mevi_tpu — a TPU-native model-enhanced vector index (MEVI-class) framework.

A brand-new JAX/XLA/Pallas/pjit retrieval engine with the capabilities of
MEVI (Model-enhanced Vector Index, NeurIPS 2023):

* twin-tower dense retrieval (T5-ANCE / coCondenser / AR2-ERNIE encoders)
  with on-device exact MIPS top-k over a corpus-sharded embedding matrix,
* a residual-quantization (RQ) cluster index built by batched k-means over
  HBM-resident document embeddings,
* an NCI-style seq2seq path that generates RQ codes with a fused,
  tree-constrained beam search (fixed-depth ``lax.scan``),
* coarse→fine re-ranking inside RQ clusters via a CSR bucket layout, and
* ensemble score fusion of the ANN and seq2seq candidate lists.

Reference behaviour is documented throughout with ``/root/reference``
file:line citations; the implementation is TPU-first, not a port.
"""

__version__ = "0.1.0"
