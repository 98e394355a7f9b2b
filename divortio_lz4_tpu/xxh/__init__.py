from .xxhash32 import xxhash32, XXHash32

__all__ = ["xxhash32", "XXHash32"]
