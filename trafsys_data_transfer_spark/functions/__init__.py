"""Engine column-function helpers."""
