from .files import read_jsonld_files, read_nquads, write_nquads

__all__ = ["read_jsonld_files", "read_nquads", "write_nquads"]
