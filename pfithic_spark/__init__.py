"""pfithic_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the pFitHiC reference (omegahh/pFitHiC).

The reference is a pandas-vectorized + multiprocessing re-implementation
of the Fit-Hi-C pipeline (Ay, Bailey & Noble, Genome Research 2014):
statistical confidence estimation for Hi-C chromatin contacts.  This
package re-expresses that operator surface Spark-first (DataFrame/SQL,
Catalyst-planned, no RDDs) and adds the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) mandated
for 100 TB-scale training-data work.

Layout (SURVEY.md §7.1):
    io.py          schemas + readers/writers (TSV/gz + parquet)
    relational.py  filters / projections / joins / set ops
    aggregates.py  global & grouped aggregations
    windows.py     window functions, equal-occupancy binning, BH-FDR,
                   scalable cumulative sums
    functions.py   scalar function families
    stats.py       numpy statistical kernels (binom_sf, PAVA, spline)
    hic.py         composed significance pipeline (run_significance)
    llmops.py      dedup / similarity / text-analysis operators
    multimodal.py  binary-column (image/audio) plumbing
    streaming.py   Structured Streaming surface
    fixtures.py    deterministic fixture derivations shared with the
                   DuckDB oracle
    registry.py    queries() / oracle_sql() registry for the driver
"""

__version__ = "0.1.0"
