"""Ray-Data-native document/main-content extraction engine.

A from-scratch, Ray-Data-first re-expression of the data-processing
capabilities of the reference repo ``DanBessa/pdf-table-extractor``
(read-only at /root/reference): layout-aware text extraction,
date-anchored record segmentation with continuation merging,
boilerplate stripping, locale-aware scalar normalization, and
per-document fault isolation — generalized to Common-Crawl-style web
page rows ``(url, warc_ts, html, text, lang)`` streamed through
``ray.data.Dataset`` pipelines.

Nothing here is a port: the reference is a single-threaded desktop app;
this engine expresses every stage as an Arrow-batch transform with
actor pools for warm parser state, explicit partitioning / skew
handling, and per-partition lineage for idempotent resume.
"""

__version__ = "0.1.0"
