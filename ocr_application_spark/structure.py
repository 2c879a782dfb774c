"""Structure stage — deterministic field extraction (K9 replacement).

The reference prompts llama3 with sorted regions and a fixed field
schema (structuring_service/app/text_structurer/structurer.py:26-131,
rules :91-97). Deterministic Spark-first replacement over span records:

1. F2: conf >= 0.5 and nonempty text (structurer.py:40-43)
2. F6: label detection by keyword allow-list (layout_detector.py:143-171)
3. J2: pair each label with the nearest value span to its right within
   the line tolerance (the bbox-proximity rule the LLM was told to use)
4. pivot label->value pairs into a map per document, "N/A" for schema
   fields with no pair (structurer.py:75-89 contract)

All built-in ops: one shuffle on url for the pairing window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# the 11-field BS schema analog (structurer.py:75-89) + invoice fields
FIELD_KEYWORDS = (
    "NOM", "PRENOM", "DATE", "MONTANT", "ADRESSE", "REFERENCE",
    "CODE", "TOTAL", "QTE", "DESIGNATION", "PRIX",
)
CONF_FLOOR_STRUCTURE = 0.5  # F2, structurer.py:40
PAIR_TOL = 15.0


def structure(spans: DataFrame, fields: tuple[str, ...] = FIELD_KEYWORDS) -> DataFrame:
    """spans(url, page, x0..y1, conf, text) -> (url, structured map).

    Labels = spans whose upper text contains a schema keyword; value =
    nearest span strictly to the right on the same line. Unmatched
    schema fields get 'N/A' like the reference's prompt contract.
    """
    ok = spans.filter(
        (F.col("conf") >= CONF_FLOOR_STRUCTURE) & (F.trim("text") != "")  # F2
    )
    up = F.upper(F.col("text"))
    field_expr = F.coalesce(
        *[F.when(up.contains(k), F.lit(k)) for k in fields]
    )
    cy = (F.col("y0") + F.col("y1")) / 2.0
    labels = ok.withColumn("field", field_expr).filter(F.col("field").isNotNull()).select(
        "url", "field",
        F.col("page").alias("lpage"), F.col("x1").alias("lx1"), cy.alias("lcy"),
    )
    vals = ok.select(
        F.col("url").alias("v_url"), F.col("text").alias("value_text"),
        F.col("page").alias("vpage"), F.col("x0").alias("vx0"), cy.alias("vcy"),
    )
    paired = (
        labels.join(
            vals,
            (F.col("v_url") == F.col("url"))
            & (F.col("vpage") == F.col("lpage"))
            & (F.abs(F.col("vcy") - F.col("lcy")) <= PAIR_TOL)
            & (F.col("vx0") >= F.col("lx1")),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url", "field").orderBy(
                    F.col("vx0") - F.col("lx1"), F.col("value_text")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("url", "field", "value_text")
    )
    # pivot to a map; missing schema fields -> 'N/A' (reference contract)
    found = paired.groupBy("url").agg(
        F.map_from_entries(F.collect_list(F.struct("field", "value_text"))).alias("_found")
    )
    all_urls = spans.select("url").distinct()
    na_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k in fields]),
        F.array(*[F.lit("N/A") for _ in fields]),
    )
    return (
        all_urls.join(found, "url", "left")
        .select(
            "url",
            F.map_zip_with(
                na_map,
                F.coalesce(F.col("_found"), F.create_map().cast("map<string,string>")),
                lambda k, default, got: F.coalesce(got, default),
            ).alias("structured"),
        )
    )
