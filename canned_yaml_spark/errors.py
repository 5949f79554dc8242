"""Located spec errors.

The reference reports schema-spec problems with severity + location
(e.g. bad type name /root/reference/canner/src/canner.cc:448-449, or
minItems > maxItems canner.cc:653-658). We mirror that with a
SpecError carrying the spec *path* (e.g. ``properties.codec.enum[2]``)
instead of a line number — specs are small driver-side objects, the
path is the useful coordinate.
"""

from __future__ import annotations


class SpecError(ValueError):
    """A schema spec is malformed. Raised at compile time on the driver."""

    def __init__(self, path: str, message: str):
        self.path = path
        self.message = message
        super().__init__(f"spec error at '{path}': {message}")


class EngineError(RuntimeError):
    """Internal engine invariant violation."""
