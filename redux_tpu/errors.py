"""Library-wide error types.

Parity with the reference error enum (``/root/reference/src/lib.rs:57-64``):
``Eof`` (unexpected end of stream), ``InvalidInput`` (bad data or bad
configuration), and ``IoError`` (wrapping an OS-level I/O failure).  The
reference's test-only ``PartialEq`` treats any two ``IoError`` values as equal
(``lib.rs:86-95``); here every error of the same class compares equal the same
way, which the error-equality test relies on.
"""

from __future__ import annotations


class ReduxError(Exception):
    """Base class for all redux_tpu errors (reference ``Error`` enum, lib.rs:57)."""

    def __eq__(self, other: object) -> bool:
        # Mirrors the reference's class-only equality (lib.rs:86-95).
        return isinstance(other, ReduxError) and type(self) is type(other)

    def __hash__(self) -> int:
        return hash(type(self))


class EofError(ReduxError):
    """The input stream has ended unexpectedly (reference ``Error::Eof``, lib.rs:59)."""

    def __str__(self) -> str:  # reference Display impl, lib.rs:69
        return "Unexpected end of file"


class InvalidInputError(ReduxError):
    """Invalid data/configuration on the input (reference ``Error::InvalidInput``, lib.rs:61).

    ``detail`` (optional) appends context after the reference-parity base
    message — e.g. the byte-only container restriction pointing at the
    README's "Deliberate non-generalities" section.  Equality stays
    class-only (lib.rs:86-95) regardless of detail.
    """

    def __init__(self, detail: str | None = None):
        super().__init__(detail)
        self.detail = detail

    def __str__(self) -> str:  # lib.rs:70 (+ optional context)
        base = "Invalid data found while processing input"
        return f"{base}: {self.detail}" if self.detail else base


class ReduxIOError(ReduxError):
    """An I/O error occurred (reference ``Error::IoError``, lib.rs:63)."""

    def __init__(self, cause: Exception | str | None = None):
        super().__init__(cause)
        self.cause = cause

    def __str__(self) -> str:  # lib.rs:71
        return f"I/O error: {self.cause}"
