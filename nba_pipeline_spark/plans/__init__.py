from .flagship import flagship

__all__ = ["flagship"]
