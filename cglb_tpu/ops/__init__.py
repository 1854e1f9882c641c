from . import kernels, cg, preconditioners, operators

__all__ = ["kernels", "cg", "preconditioners", "operators"]
