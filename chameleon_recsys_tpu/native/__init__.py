from .loader import NativeSessionLoader, native_available

__all__ = ["NativeSessionLoader", "native_available"]
