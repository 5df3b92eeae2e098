"""cosmos_predict2_tpu — a TPU-native (JAX/XLA/Pallas) world-foundation-model framework.

A from-scratch rebuild of the capabilities of NVIDIA Cosmos-Predict2.5
(reference: sidfeels/cosmos-predict2.5): flow-based video diffusion
transformers unifying Text2World / Image2World / Video2World, a causal
3D-conv video VAE tokenizer, rectified-flow + UniPC sampling,
autoregressive long-video generation, DMD2 few-step distilled inference,
and action-conditioned / multiview variants — designed TPU-first:

* compute path: jnp / Pallas kernels on the MXU, bf16 matmuls
* parallelism: one `jax.sharding.Mesh` with axes (dp, fsdp, cp, tp);
  Ulysses sequence parallelism is two `lax.all_to_all`s inside
  `shard_map` around a flash-attention kernel
* sampling loops are `lax.scan`s compiled once by XLA
"""

__version__ = "0.1.0"
