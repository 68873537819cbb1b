"""aclgan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for ACL-GAN.

A ground-up reimplementation of the capabilities of hyperplane-lab/ACL-GAN
(PyTorch, ECCV 2020 "Unpaired Image-to-Image Translation using Adversarial
Consistency Loss") designed TPU-first:

- pure functional models (flax.linen) with explicit AdaIN parameter threading
  (the reference mutates module state at networks.py:154-163 — here AdaIN
  params flow down the call as arguments),
- NHWC layouts and bf16 compute feeding the MXU,
- single fused jitted train steps (D-step / D+G-step) built with
  jax.value_and_grad, no per-op Python in the hot loop,
- data-parallel scaling via jax.sharding.Mesh + NamedSharding (the reference
  is single-GPU only; train.py:42),
- Pallas kernels for the bandwidth-bound fusions (instance-norm+activation,
  focus-mask blend),
- a multi-threaded host input pipeline with a native C++ augmentation core.
"""

__version__ = "0.1.0"

from aclgan_tpu.config import Config, load_config  # noqa: F401
