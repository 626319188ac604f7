"""Extension operators for large-scale training-data pipelines
(BASELINE.json north star): dedup, similarity search, text analysis,
multimodal columns. All hot paths are Spark built-in expressions
(whole-stage codegen); Python only appears in the multimodal decode
stub (Arrow-batched mapInPandas).
"""
