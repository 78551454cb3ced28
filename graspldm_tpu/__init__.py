"""graspldm_tpu: a TPU-native generative 6-DoF grasp synthesis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GraspLDM
(kuldeepbrd1/graspLDM): point-cloud-conditioned grasp-pose VAEs and latent
diffusion models, designed for TPU hardware — MXU-friendly dense ops, fully
on-device `lax.scan` samplers, `jax.sharding` data parallelism over ICI.
"""

__version__ = "0.1.0"
