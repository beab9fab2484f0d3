"""Score & user-analytics operators (M3): A1, A4–A6, J6/J7, O2–O4.

Replaces the reference's FastAPI service layer and TS score calculator with
pure native aggregations (the reference's Python/TS loops are accidental
hash joins / conditional sums — SURVEY §2.4 J9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# /root/reference/app/services/user_answer_service.py:137-145
DIFFICULTY_WEIGHTS = {"LOW": 0.8, "MID": 1.0, "HIGH": 1.2}
MANDATORY_WEIGHT = 1.5
# /root/reference/src/utils/score/config.ts:16-44
MANDATORY_PENALTY_FACTOR = 0.2
DIFFICULTY_BONUS = {"LOW": 0.0, "MID": 0.0, "HIGH": 0.2}
MAX_SCORE = 100.0
DECIMAL_PLACES = 1


def _difficulty_weight() -> F.Column:
    return (
        F.when(F.col("difficulty") == "LOW", DIFFICULTY_WEIGHTS["LOW"])
        .when(F.col("difficulty") == "HIGH", DIFFICULTY_WEIGHTS["HIGH"])
        .otherwise(DIFFICULTY_WEIGHTS["MID"])
    )


def weighted_scores(user_answers: DataFrame, question_meta: DataFrame) -> DataFrame:
    """A5 — per (user_id, exam_type) blended pass-rate score.

    Reference loop: /root/reference/app/services/user_answer_service.py:119-177.
    base = correct/total·100; weight = difficulty_weight × (mandatory→×1.5);
    weighted = Σ correct·w / Σ w · 100; final = round(0.4·base + 0.6·weighted, 2).
    Answers whose question_id is missing from question_meta contribute to the
    base score but not the weighted score (the reference ``continue``s them).

    question_meta is broadcast (dimension table); one shuffle on the group key.
    """
    joined = user_answers.join(
        F.broadcast(question_meta.select("question_id", "difficulty", "is_mandatory")),
        "question_id",
        "left",
    )
    known = F.col("difficulty").isNotNull()
    w = F.when(
        known,
        _difficulty_weight()
        * F.when(F.col("is_mandatory"), MANDATORY_WEIGHT).otherwise(1.0),
    ).otherwise(0.0)
    correct = F.col("status").cast("int")
    agg = joined.groupBy("user_id", "exam_type").agg(
        F.sum(correct).alias("correct_count"),
        F.sum(1 - correct).alias("wrong_count"),
        F.sum(F.when(F.col("status"), w).otherwise(0.0)).alias("weighted_correct"),
        F.sum(w).alias("total_weight"),
    )
    total = F.col("correct_count") + F.col("wrong_count")
    base = F.when(total > 0, F.col("correct_count") / total * 100.0).otherwise(0.0)
    weighted_pct = F.when(
        F.col("total_weight") > 0, F.col("weighted_correct") / F.col("total_weight") * 100.0
    ).otherwise(0.0)
    return agg.select(
        "user_id",
        "exam_type",
        "correct_count",
        "wrong_count",
        F.round(base * 0.4 + weighted_pct * 0.6, 2).alias("total_score"),
    )


def calculate_scores(user_answers: DataFrame, question_meta: DataFrame) -> DataFrame:
    """A6 — the TS score calculator as one aggregation per (user, exam_type).

    Reference: /root/reference/src/utils/score/calculator.ts:22-130.
    base = correct/totalQuestions·100 (totalQuestions = questions in meta for
    the exam_type); mandatoryFactor = 1 if all mandatory correct or none
    mandatory, else 1 − (1 − cm/tm)·0.2; bonus = HIGH-correct·0.2;
    final = min(100, base·factor + bonus) rounded to 1dp.
    """
    totals = question_meta.groupBy("exam_type").agg(
        F.count("*").alias("total_questions"),
        F.sum(F.col("is_mandatory").cast("int")).alias("total_mandatory"),
    )
    joined = user_answers.join(
        F.broadcast(question_meta.select("question_id", "difficulty", "is_mandatory")),
        "question_id",
        "inner",
    )
    per_user = joined.groupBy("user_id", "exam_type").agg(
        F.sum(F.col("status").cast("int")).alias("correct_answers"),
        F.sum((F.col("status") & F.col("is_mandatory")).cast("int")).alias("correct_mandatory"),
        F.sum((F.col("status") & (F.col("difficulty") == "HIGH")).cast("int")).alias("correct_high"),
        F.sum((F.col("status") & (F.col("difficulty") == "MID")).cast("int")).alias("correct_mid"),
        F.sum((F.col("status") & (F.col("difficulty") == "LOW")).cast("int")).alias("correct_low"),
    )
    df = per_user.join(F.broadcast(totals), "exam_type", "inner")
    base = F.when(
        F.col("total_questions") > 0,
        F.col("correct_answers") / F.col("total_questions") * 100.0,
    ).otherwise(0.0)
    factor = (
        F.when(F.col("total_mandatory") == 0, 1.0)
        .when(F.col("correct_mandatory") == F.col("total_mandatory"), 1.0)
        .otherwise(
            1.0
            - (1.0 - F.col("correct_mandatory") / F.col("total_mandatory"))
            * MANDATORY_PENALTY_FACTOR
        )
    )
    bonus = (
        F.col("correct_low") * DIFFICULTY_BONUS["LOW"]
        + F.col("correct_mid") * DIFFICULTY_BONUS["MID"]
        + F.col("correct_high") * DIFFICULTY_BONUS["HIGH"]
    )
    final = F.round(F.least(F.lit(MAX_SCORE), base * factor + bonus), DECIMAL_PLACES)
    return df.select(
        "user_id",
        "exam_type",
        final.alias("final_score"),
        F.round(base, 6).alias("base_score"),
        F.round(factor, 6).alias("mandatory_factor"),
        F.round(bonus, 6).alias("difficulty_bonus"),
    )


def best_stat_per_user(user_stats: DataFrame) -> DataFrame:
    """A4 — max-by total_score per (user, exam_type)
    (/root/reference/app/services/user_answer_service.py:49-50)."""
    return user_stats.groupBy("user_id", "exam_type").agg(
        F.max_by(F.struct("total_score", "correct_count", "wrong_count"), "total_score").alias("best")
    ).select("user_id", "exam_type", "best.*")


def recent_answers(user_answers: DataFrame, n: int = 20) -> DataFrame:
    """O2 — last-N answers per (user, exam_type)
    (/root/reference/app/services/frequent_question_service.py:47-52)."""
    w = Window.partitionBy("user_id", "exam_type").orderBy(
        F.desc("created_at"), F.desc("question_id")
    )
    return (
        user_answers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def frequent_questions_excluding_recent(
    frequent_questions: DataFrame,
    user_answers: DataFrame,
    user_id: str,
    exam_type: str,
    limit: int = 10,
    recent_n: int = 20,
) -> DataFrame:
    """J6 + O3 — ranked frequent questions, excluding recently answered
    (/root/reference/app/services/frequent_question_service.py:44-63).
    NOT-IN becomes a left_anti join."""
    recent = (
        recent_answers(
            user_answers.filter(
                (F.col("user_id") == user_id) & (F.col("exam_type") == exam_type)
            ),
            recent_n,
        )
        .select("question_id")
        .distinct()
    )
    return (
        frequent_questions.filter(F.col("exam_type") == exam_type)
        .join(recent, "question_id", "left_anti")
        .orderBy(F.desc("final_score"), "question_id")
        .limit(limit)
    )


def weak_questions(
    user_answers: DataFrame,
    question_meta: DataFrame,
    user_id: str,
    exam_type: str,
    limit: int = 10,
) -> DataFrame:
    """A1 + O4 — most-missed questions ranked by priority
    (/root/reference/app/services/weak_question_service.py:47-103):
    incorrect_count per question, then priority = difficulty_score(1/2/3) ×
    (mandatory→2 else 1), sorted by (priority desc, incorrect desc)."""
    incorrect = (
        user_answers.filter(
            (F.col("user_id") == user_id)
            & (F.col("exam_type") == exam_type)
            & (~F.col("status"))
        )
        .groupBy("question_id")
        .agg(F.count("*").alias("incorrect_count"))
    )
    joined = incorrect.join(
        F.broadcast(question_meta.select("question_id", "difficulty", "is_mandatory")),
        "question_id",
        "inner",
    )
    diff_score = (
        F.when(F.col("difficulty") == "LOW", 1)
        .when(F.col("difficulty") == "MID", 2)
        .otherwise(3)
    )
    priority = diff_score * F.when(F.col("is_mandatory"), 2).otherwise(1)
    return (
        joined.withColumn("priority", priority)
        .orderBy(F.desc("priority"), F.desc("incorrect_count"), "question_id")
        .limit(limit)
    )
