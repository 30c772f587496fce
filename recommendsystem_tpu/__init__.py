"""recommendsystem_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CTR & ranking framework.

A from-scratch re-design of the capabilities of ``yueshifeng/recommendSystem``
(reference mounted read-only at ``/root/reference``), built TPU-first:

- ``embedding/``  distributed sparse-embedding engine (slot registry, hashed
  tables, per-row sparse optimizers, row-sharded all-to-all lookup) replacing
  the reference's external ``tensornet`` parameter-server runtime
  (reference: ``rank/ctr/base_model.py``, ``staytime/VideoDnn.py:217-263``).
- ``nn/``         one canonical layer library deduplicating the reference's
  per-package copies (``InteractingLayer.py``, ``din.py``,
  ``staytime/layer.py``, ``rough_rank/layer.py``).
- ``models/``     the model zoo: autoint, ctr (SENet+AutoInt+PPNet+MMoE+CAN),
  multi_head (7-task), finish (DeepFM+gating), staytime (MTL+DIN+400-bin EV
  head), rough_rank (DSSM+PLE+KD).
- ``train/``      jit'd train/eval harness, losses, streaming metrics
  (AUC/COPC/CTR/GAUC), checkpoint/resume, predict dump.
- ``data/``       TFRecord / tf.Example parsing without TensorFlow, label
  engineering (``staytime/parse.py``), synthetic data.
- ``search/``     offline score-fusion search (PSO ``pso/``, GP ``gaussain/``).
- ``kernels/``    Pallas TPU kernels for the hot paths.
"""

__version__ = "0.1.0"
