"""Utilities: checkpoint interop, video IO, profiling, tokenizers."""
