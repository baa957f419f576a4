from .api import GraphQueryAPI

__all__ = ["GraphQueryAPI"]
