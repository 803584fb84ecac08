"""leopard-tpu: TPU-native vision-language framework for text-rich multi-image
understanding (from-scratch rebuild of tencent-ailab/Leopard's capabilities
on JAX/XLA/Pallas)."""

__version__ = "0.1.0"
