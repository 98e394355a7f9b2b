from .buffers import ensure_buffer, concat_bytes, read_u32le, write_u32le

__all__ = ["ensure_buffer", "concat_bytes", "read_u32le", "write_u32le"]
