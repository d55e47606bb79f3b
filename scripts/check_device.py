"""Device availability check (the reference's one-line test.py prints
cuDNN availability; this prints the JAX TPU/CPU backend status)."""

import jax

devices = jax.devices()
print(f"backend: {devices[0].platform}, devices: {len(devices)}")
print(devices)
