"""Corpus-distribution statistics: drift divergence between corpus
slices and token co-occurrence association (PMI).

Training-data curation at 100 TB needs distribution MONITORING on top of
filtering: "did this week's crawl drift from last week's?" (divergence
between unigram distributions) and "which token pairs are anomalously
associated?" (PMI — phrase mining, template/boilerplate detection).  Both
are two-pass corpus statistics with the same shape as doc_unigram_df_score:
a global token aggregate (the small, broadcastable side) joined back
against the corpus.

No counterpart in the reference (single-table movie ETL,
transform.py:80-207); these extend the LLM-pipeline tier mandated by the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus_stats import kl_drift_summary, pmi_pairs
from ..sources.readers import load_star_table
from .catalog import register
from .textops import _TOKENS_CTE


@register(
    "corpus_kl_drift",
    """
WITH tok AS (
  SELECT lang,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
ex AS (SELECT lang, unnest(ts) AS token FROM tok),
cnt AS (
  SELECT token,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_a,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS c_b
  FROM ex GROUP BY token
),
tot AS (SELECT SUM(c_a) AS t_a, SUM(c_b) AS t_b, COUNT(*) AS v FROM cnt),
pq AS (
  SELECT t_a, t_b, v,
         (c_a + 1) / CAST(t_a + v AS DOUBLE) AS p,
         (c_b + 1) / CAST(t_b + v AS DOUBLE) AS q
  FROM cnt, tot
)
SELECT CAST(MIN(v) AS BIGINT) AS vocab_size,
       CAST(MIN(t_a) AS BIGINT) AS tokens_a,
       CAST(MIN(t_b) AS BIGINT) AS tokens_b,
       ROUND(SUM(p * ln(p / q)), 4) AS kl_ab,
       ROUND(SUM(q * ln(q / p)), 4) AS kl_ba,
       ROUND(SUM(0.5 * p * ln(2 * p / (p + q))
                 + 0.5 * q * ln(2 * q / (p + q))), 4) AS js_divergence
FROM pq
""",
    "corpus drift monitor: add-one-smoothed unigram distributions of two "
    "corpus slices (lang='en' vs rest) compared by KL divergence both "
    "ways and Jensen-Shannon divergence — the weekly-crawl drift check a "
    "100 TB ingest runs before admitting a new batch; one token-level "
    "groupBy (map-side combinable) then a scalar fold over the joint "
    "vocabulary, which is the tiny side regardless of corpus size",
    tags=("text", "corpus-stats", "drift"),
)
def q_corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_star_table(spark, sf_dir, "documents")
    return kl_drift_summary(docs, F.col("lang") == "en")


@register(
    "cooccurrence_pmi",
    _TOKENS_CTE
    + """,
ex AS (SELECT doc_id, unnest(list_distinct(ts)) AS token FROM tok),
dfs AS (SELECT token, COUNT(*) AS df FROM ex GROUP BY token),
band AS (SELECT token, df FROM dfs WHERE df BETWEEN 50 AND 450),
bex AS (SELECT doc_id, token, df FROM ex JOIN band USING (token)),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM ex),
pairs AS (
  SELECT a.token AS t1, b.token AS t2,
         COUNT(*) AS n_both,
         MIN(a.df) AS df1, MIN(b.df) AS df2
  FROM bex a JOIN bex b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
)
SELECT t1, t2, CAST(n_both AS BIGINT) AS n_both,
       ROUND(ln(n_both * CAST((SELECT n FROM nd) AS DOUBLE) / (df1 * df2)), 4)
           AS pmi
FROM pairs
WHERE n_both >= 20
""",
    "token co-occurrence PMI (phrase/boilerplate mining): document-level "
    "pointwise mutual information ln(P(t1,t2)/(P(t1)P(t2))) for every "
    "token pair inside a document-frequency band — the band filter (df "
    "50..450 here) is the scale knob that drops both the singleton tail "
    "and stopword-grade hot keys BEFORE the per-document pair expansion, "
    "so the self-join fans out only over mid-frequency tokens; df side "
    "broadcast, membership thresholds all exact integers",
    tags=("text", "corpus-stats"),
)
def q_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_star_table(spark, sf_dir, "documents")
    return pmi_pairs(docs, min_df=50, max_df=450, min_both=20)
