"""Large-scale training-data-pipeline operators (beyond the reference's own
surface): dedup family, similarity search, text analysis, multimodal columns.

Every operator here is (a) pure DataFrame/built-in-function Spark — JVM-side,
codegen-friendly, no Python in the hot path (multimodal decode stubs are the
sole, explicitly-gated exception), and (b) paired with an ANSI-SQL oracle in
__spark_entry__.oracle_sql() via the shared deterministic hash in hashing.py.
"""
