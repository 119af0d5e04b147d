"""ealv_tpu — TPU-native embodied active learning of generative sensor-object models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
apinosky/embodied-active-learning-vision (reference: franka_test ROS package):
a robot with a wrist camera actively explores a scene, learns a conditional
VAE online, drives exploration with a sample-based KL-ergodic MPC targeting
the model's own predictive uncertainty, then extracts latent "fingerprints"
and re-localizes objects with Bayesian belief grids.

Architecture stance (TPU-first, not a port):
  - The reference's 7-process CPU choreography (explorer, DDP trainers,
    plotters, clustering) collapses to interleaved jitted device programs
    over a single state pytree.
  - The hot ops (2000-sample uncertainty decode, 3000x2000 ergodic footprint
    kernel) become batched MXU matmuls / fused Pallas kernels instead of
    torch.jit.fork thread fan-out.
  - Data parallelism is jax.sharding/shard_map over a Mesh (replaces
    torch DDP + oneCCL); the shared-memory replay buffer becomes a
    device-resident ring-buffer pytree.
"""

__version__ = "0.1.0"
