from .files import read_jsonld_files, write_nquads

__all__ = ["read_jsonld_files", "write_nquads"]
