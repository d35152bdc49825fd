"""Per-document parsing kernel (no Ray imports allowed here).

Everything in this package is a plain-Python scalar kernel executed
inside ``map_batches`` UDFs; it must stay importable and testable
without a Ray runtime.
"""
