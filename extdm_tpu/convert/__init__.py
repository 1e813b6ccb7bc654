from extdm_tpu.convert import torch2jax

__all__ = ["torch2jax"]
