"""Pallas TPU kernels — the device-native tier (the analog of the
reference's HLSL compute shaders, SURVEY.md §2 #1/#14)."""
