"""Tarification analytics — the reference's /Tarification chain, Spark-first.

Reference flow (Tarification_service isoler/app/main.py:40-123):
OCR -> structure -> fuzzy-match meds catalog -> totals -> reserve ->
forecasts, with files on disk as the IR between steps. Here it is one
lazy DataFrame composition:

  invoice_lines ⋈(fuzzy) catalog -> enrich -> aggregate -> forecast

Catalog parsing replicates the comma-decimal handling of
tarification_pipeline.py:170-173 ("6,01" -> 6.01); the fuzzy join is J1
(broadcast + levenshtein top-1, accept >= 90 else null-extend, threshold
tarification_pipeline.py:168); quantite defaults to 1 when null
(:161); totals/taux per :205-207; reserve = mean(nonzero) * 1.1 (:229,
reserve factor :263).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MATCH_THRESHOLD = 90.0  # tarification_pipeline.py:168
_DEC = "decimal(18,5)"


def parse_catalog(raw: DataFrame) -> DataFrame:
    """catalog(name, price, remboursement) with comma-decimal strings ->
    typed columns (S9: strip/lower normalize + parse)."""
    num = lambda c: F.regexp_replace(F.trim(F.col(c)), ",", ".").cast("double")
    return raw.select(
        F.lower(F.trim(F.col("name"))).alias("cat_name"),
        num("price").alias("cat_price"),
        num("remboursement").alias("cat_remboursement"),
    )


def fuzzy_match_catalog(lines: DataFrame, catalog: DataFrame) -> DataFrame:
    """J1 at the reference threshold: broadcast the catalog, levenshtein
    similarity ratio, top-1 per line, accept >= 90 else null-extend.

    Top-1 MAXIMIZES the length-normalized ratio (fuzzywuzzy extractOne
    semantics, tarification_pipeline.py:168) — not minimal raw edit
    distance, which would prefer a short sloppy match over a longer,
    proportionally closer one. The ratio is a division of identical
    ints in both engines, so the ordering is cross-engine stable; ties
    break on cat_name.

    Scale shape: only threshold-passing pairs enter the top-1 window.
    A candidate scoring < 90 can NEVER surface (every matched_* column
    nulls out), so pre-filtering them changes nothing — and it removes
    the |catalog|x row amplification through the window exchange. Two
    prunes stack: an INTEGER length-bound superset test (lev >=
    |len_a - len_b|, so 100*|Δlen| <= (100-thr)*maxlen + 100 is
    necessary; integer arithmetic so no float-boundary disagreement
    with the score filter) short-circuits levenshtein entirely for
    most pairs; survivors take the exact float score filter. Lines
    whose every candidate fell below threshold rejoin by null-extension
    (left join on the line key), preserving exactly-one-row-per-line."""
    if catalog.isEmpty():
        # null-extension must survive an empty catalog: every line kept,
        # nothing matched (a cross join would silently drop all rows)
        return lines.select(
            *lines.columns,
            F.lit(None).cast("string").alias("matched_name"),
            F.lit(None).cast("double").alias("score"),
            F.lit(None).cast("double").alias("prix_catalogue"),
            F.lit(None).cast("double").alias("remboursement_unitaire"),
        )
    probe = lines.select(
        "url", "line_id", F.lower(F.trim(F.col("nom"))).alias("_nom_norm")
    )
    la, lb = F.length("_nom_norm"), F.length("cat_name")
    slack = int(round(100 - MATCH_THRESHOLD))
    length_bound = (
        100 * F.abs(la - lb) <= slack * F.greatest(la, lb) + 100
    )
    lev = F.levenshtein(F.col("_nom_norm"), F.col("cat_name"))
    score = 100.0 * (1.0 - lev.cast("double") / F.greatest(la, lb))
    w = Window.partitionBy("url", "line_id").orderBy(F.desc(score), F.col("cat_name"))
    top1 = (
        probe.join(F.broadcast(catalog), length_bound)
        .withColumn("match_score", score)
        .filter(F.col("match_score") >= MATCH_THRESHOLD)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "url",
            "line_id",
            F.col("cat_name").alias("matched_name"),
            F.col("match_score").alias("score"),
            F.col("cat_price").alias("prix_catalogue"),
            F.col("cat_remboursement").alias("remboursement_unitaire"),
        )
    )
    return lines.join(top1, ["url", "line_id"], "left").select(
        *lines.columns, "matched_name", "score", "prix_catalogue",
        "remboursement_unitaire",
    )


def tarify(lines: DataFrame, catalog: DataFrame) -> DataFrame:
    """Per-line tarification: match + remboursement_total =
    quantite(default 1) * remboursement_unitaire (null when unmatched,
    like the reference's null-extension)."""
    m = fuzzy_match_catalog(lines, catalog)
    qty = F.coalesce(F.col("quantite"), F.lit(1))  # default qty=1 (:161)
    return m.withColumn(
        "remboursement_total",
        (qty.cast(_DEC) * F.col("remboursement_unitaire").cast(_DEC)).cast("double"),
    )


def summarize(tarified: DataFrame) -> DataFrame:
    """A1+A2: totals + coverage ratio with zero guard (:205-207)."""
    f_sum = F.sum(F.col("prix_total").cast(_DEC))
    r_sum = F.sum(F.col("remboursement_total").cast(_DEC))
    return tarified.agg(
        f_sum.cast("double").alias("total_facture"),
        r_sum.cast("double").alias("total_rembourse"),
        F.when(f_sum > 0, F.round(100.0 * r_sum.cast("double") / f_sum.cast("double"), 2))
        .alias("taux_couverture"),
        F.count("*").alias("n_lignes"),
        F.count("matched_name").alias("n_matched"),
    )


def reserve_estimate(tarified: DataFrame, factor: float = 1.1) -> DataFrame:
    """A3 + reserve: mean of nonzero remboursements * count * factor
    (simple reserve of tarification_pipeline.py:229,263).

    The mean is sum(decimal)/count, not float avg: a float running mean
    depends on partition visit order (nondeterministic run to run, let
    alone engine to engine); the decimal sum is order-independent and
    the single double division is bit-stable."""
    nz = F.when(
        F.col("remboursement_total").isNotNull() & (F.col("remboursement_total") != 0),
        F.col("remboursement_total"),
    )
    s = F.sum(nz.cast(_DEC))
    n = F.count(nz)
    mean = F.when(n > 0, s.cast("double") / n)
    return tarified.agg(
        mean.alias("mean_remboursement"),
        ((mean * n) * factor).alias("reserve_simple"),
    )


def monthly_series(tarified: DataFrame) -> DataFrame:
    """A4: month rollup of remboursements; date_facture is DD/MM/YYYY
    (dayfirst parse, tarification_pipeline.py:244-248)."""
    d = F.to_date(F.col("date_facture"), "dd/MM/yyyy")
    return (
        tarified.filter(F.col("remboursement_total").isNotNull())
        .groupBy(F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("mois"))
        .agg(F.sum(F.col("remboursement_total").cast(_DEC)).cast("double").alias("total_mois"))
        .orderBy("mois")
    )
