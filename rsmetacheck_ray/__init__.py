"""rsmetacheck_ray — a Ray-Data-native web-text quality gate.

A from-scratch engine with the query/data-processing capabilities of
Anas-Elhounsri/RsMetaCheck (see /root/repo/SURVEY.md), recast per the
north rule as a document-level keep/drop + scrub pipeline over
Common-Crawl-style Parquet tables ``(url, warc_ts, html, text, lang)``.

Architecture (idiomatic Ray Data, NOT a port of the reference's
sequential file loop, ``detect_pitfalls_main.py:313``):

    read_parquet → extract (stateless map_batches, zero-copy Arrow)
                 → langid (actor pool)
                 → perplexity (actor pool)
                 → rule catalog + scrub (stateless map_batches)
                 → write_parquet(kept) + lineage + metrics manifest

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
driver, ``bench.py`` and the pytest session fixture own the session.
"""

__version__ = "0.1.0"
