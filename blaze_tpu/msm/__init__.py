from .pippenger import MSM, MSMConfig, default_window_bits

__all__ = ["MSM", "MSMConfig", "default_window_bits"]
