from .pipeline import decode_and_postprocess, ldm_generate, vae_generate

__all__ = ["decode_and_postprocess", "ldm_generate", "vae_generate"]
