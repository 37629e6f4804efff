"""kgc — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the capabilities of
chrlesur/json-ld-converter (reference at /root/reference, Go):
parse → tokenize → segment → extract → link → canonicalize →
materialize (subj, pred, obj) triples + a schema.org JSON-LD
@context mapping table.

Design notes
------------
* DataFrame/SQL + Catalyst everywhere; pandas/Arrow UDFs only for the
  per-document sequential folds (segment packing) and dictionary
  mention scans. Zero per-row Python UDFs.
* The unit of data is one *document row* with an ordered span array
  (input_hint shape)::

      doc_id: string,
      spans:  array<struct<kind:string, text:string,
                           media_ref:string, offset:int>>

  Array order IS element order — the per-row invariant vs the
  reference parser/segmenter is sequence equality of
  (kind, text, media_ref, order).
* Stages land as table writes (Iceberg on a real cluster; parquet +
  snapshot manifest locally) so resume falls out of the architecture.
* The constructed KG is queryable in place (kgc.graph: all four
  SPARQL 1.1 query forms compiled onto Catalyst — BGP joins, group
  algebra, property paths incl. sequences and grouped closures,
  named-graph GRAPH scope over provenance quads, scalar/string
  builtins, aggregates over expressions) and interchanges losslessly
  (kgc.triples: N-Triples and JSON-LD, both directions, bit-exact
  round trips; kg_diff for snapshot-to-snapshot QA).
"""

__version__ = "0.1.0"
