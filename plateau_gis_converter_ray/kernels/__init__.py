"""Pure computational kernels (numpy / pyarrow only — no Ray imports).

These port the *math* of the reference (cited per-module) and are the
conformance core: every module carries fixtures taken from the reference's
unit tests.
"""
