"""Interop runtimes: foreign model formats compiled to jitted JAX functions."""
