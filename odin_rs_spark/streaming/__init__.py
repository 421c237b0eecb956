"""Structured Streaming re-expression of the reference's actor/stream
semantics (SURVEY §2.11, T1-T12)."""
