from . import gaussian, gpr, sgpr, cglb

__all__ = ["gaussian", "gpr", "sgpr", "cglb"]
