from .api import compact, expand, flatten, frame, from_rdf, to_rdf
from .context import Context
from .errors import JsonLdError
from .loader import CachingLoader, FileLoader, RemoteDocument, StaticLoader
from .options import JsonLdOptions

__all__ = [
    "CachingLoader",
    "Context",
    "FileLoader",
    "JsonLdError",
    "JsonLdOptions",
    "RemoteDocument",
    "StaticLoader",
    "compact",
    "expand",
    "flatten",
    "frame",
    "from_rdf",
    "to_rdf",
]
