from .full_kg import full_kg_run

__all__ = ["full_kg_run"]
