"""Tag search & analytics operators (M3): J3–J5, A2, A8.

Replaces the reference's PL/pgSQL tag functions and tag_manager queries
(/root/reference/db/tags_schema.sql:89-142, src/tag_manager.py:390-558).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_histogram(question_tags: DataFrame, tag_key: str) -> DataFrame:
    """A2: value histogram for one tag, count desc
    (/root/reference/src/tag_manager.py:552-558)."""
    return (
        question_tags.filter(F.col("tag_key") == tag_key)
        .groupBy("tag_value")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "tag_value")
    )


def questions_by_tag(
    questions: DataFrame, question_tags: DataFrame, tag_key: str, tag_value: str
) -> DataFrame:
    """J3 + UDTF analog of ``get_questions_by_tag``
    (/root/reference/db/tags_schema.sql:89-101): predicate pushed below the
    join; tag side pre-filtered then semi-joined."""
    matching = question_tags.filter(
        (F.col("tag_key") == tag_key) & (F.col("tag_value") == tag_value)
    ).select("question_id")
    return questions.join(matching, "question_id", "left_semi")


def questions_by_multiple_tags(
    questions: DataFrame, question_tags: DataFrame, conditions: dict[str, str]
) -> DataFrame:
    """J5 — AND-search over (tag_key → tag_value) conditions.

    The reference iterates DELETE-per-condition over a temp table
    (/root/reference/db/tags_schema.sql:105-142). Here it is a single pass:
    filter tags to any matching condition, count distinct matched keys per
    question, keep questions matching ALL conditions, semi-join back. One
    shuffle on question_id regardless of condition count.
    """
    if not conditions:
        return questions
    cond = None
    for k, v in conditions.items():
        c = (F.col("tag_key") == k) & (F.col("tag_value") == v)
        cond = c if cond is None else (cond | c)
    matched = (
        question_tags.filter(cond)
        .groupBy("question_id")
        .agg(F.count_distinct("tag_key").alias("n_matched"))
        .filter(F.col("n_matched") == len(conditions))
        .select("question_id")
    )
    return questions.join(matched, "question_id", "left_semi")


def enrich_tags(question_tags: DataFrame, tag_definitions: DataFrame) -> DataFrame:
    """J4: broadcast-join tag rows with their definitions
    (/root/reference/src/tag_manager.py:390-397)."""
    return question_tags.join(F.broadcast(tag_definitions), "tag_key", "left")


def questions_with_min_years(
    question_tags: DataFrame, min_years: int = 2, tag_key: str = "year_list"
) -> DataFrame:
    """A8: ``json_array_length(tag_value) >= k``
    (/root/reference/src/tag_manager.py:513-520)."""
    return (
        question_tags.filter(F.col("tag_key") == tag_key)
        .withColumn("years", F.from_json("tag_value", "array<string>"))
        .filter(F.size("years") >= min_years)
        .select("question_id", F.size("years").alias("n_years"), "years")
    )


def dedupe_tags(question_tags: DataFrame) -> DataFrame:
    """U3: enforce UNIQUE(question_id, tag_key) before a MERGE
    (/root/reference/db/tags_schema.sql:37)."""
    return question_tags.dropDuplicates(["question_id", "tag_key"])
