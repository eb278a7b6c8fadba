"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's CDC surface, a 100 TB transcript lake needs corpus
curation primitives; these are first-class engine operators:

  dedup.py       exact, n-gram Jaccard, MinHash+LSH, SimHash
  similarity.py  brute-force + IVF-pruned top-k vector search
  textstats.py   token counting, quality stats, language-ID, fingerprints
  multimodal.py  binary media columns: schema, batching, decode plumbing

All hot paths are JVM expressions (whole-stage codegen); Python appears only
in multimodal decode (Arrow-batched mapInPandas).
"""
