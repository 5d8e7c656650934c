"""Positioned parse errors.

Mirrors the reference's error surface — every production rejects bad input
with a kind + line/byte position (/root/reference/turtle/src/error.rs:14-35,
api/src/parser.rs:179-208) — but errors become *rows*, never job failures
(SURVEY.md §2.5 F1/F2)."""

from __future__ import annotations


class ParseError(Exception):
    def __init__(self, kind: str, msg: str, line: int = 0, byte: int = 0):
        super().__init__(f"{kind} at {line}:{byte}: {msg}")
        self.kind = kind
        self.msg = msg
        self.line = line
        self.byte = byte

    def as_row(self) -> dict:
        return {"kind": self.kind, "line": self.line, "byte": self.byte, "msg": self.msg}


# nesting guard, same constant as the reference (turtle/src/lib.rs:74-78)
MAX_STACK_SIZE = 128
