"""smart_pdf_md_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimagination of the reference pipeline
(supermarsx/smart-pdf-md, a sequential scan→filter→route→convert→write→summarize
CLI over PDF files; see /root/reference/src/smart_pdf_md/core.py:1091-1155) as
distributed triple extraction over a table of source-code repositories:

    repo_files(repo, path, commit, lang, content)
      → route (AST vs regex, textuality heuristic)
      → vectorized mention extraction (imports, defs, calls, doc entities)
      → candidate entity linking (char-ngram MinHash + TF-IDF cosine)
      → canonicalization via connected components (iterative DataFrame joins)
      → (subj, pred, obj) triples

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no per-row Python
UDFs, no RDD usage in the data path. Designed for a multi-executor cluster at
~10^12-file scale; tested locally on small deterministic corpora.
"""

__version__ = "0.1.0"
