"""Flax models: EyeNet (ResNet18-IN + GRU), RefineNet (enc-dec ConvRNN), EVE."""
