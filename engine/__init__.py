"""PySpark-native time-series rollup / downsample / retention engine.

Built from scratch against the pinned semantics in SURVEY.md §2.1 (the
reference mount /root/reference was empty at survey and build time — see
SURVEY.md §0; BASELINE.json is the authoritative spec, cited as B:<line>).

Layout (SURVEY.md §7):
    engine.schema       pinned constants + fixed StructTypes
    engine.session      SparkSession builder with K3 AQE/shuffle confs
    engine.io           S1 scan, S2/S3 tier write/read (TableFormat shim), S4 synth
    engine.series       P2 explode, G1 gap_fill, P3 reassemble
    engine.stats        R1-R4 rolling stats + detect
    engine.rollup       A1-A4 tier aggregation / cascade
    engine.compression  C1-C3 delta-of-delta + Gorilla XOR (Arrow UDFs)
    engine.lineage      L1-L3 commit protocol / resume
    engine.query        Q1-Q4 downsample read path
    engine.skew         K1-K2 bucketing + salting
    engine.oracle       single-machine pandas/NumPy twin (the pytest gate)
"""

__version__ = "0.1.0"
