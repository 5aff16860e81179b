"""Car accidents — mirrors /root/reference/examples/car_accidents.rs:
the three workshop queries over an accidents CSV (NYC collisions shape).

Q1: lethal accidents per (year, week)            — map + group_by_sum
Q2: accidents & lethality per contributing factor — flat_map(unique) +
    group_by_fold
Q3: accidents & lethal per (borough, week), then the split stream also
    aggregated per (borough, week-of-year) with % lethal — split + two
    group_by_folds

The week computation mirrors the reference's DAYS_BEFORE table + leap
rule (car_accidents.rs:14,39-48) as Column expressions.

Usage: python examples/car_accidents.py [accidents.csv]
(with no argument a small deterministic sample CSV is generated)
"""
import csv
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from renoir_spark import StreamContext

DAYS_BEFORE = [0, 0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]


def week_cols(date_col):
    """(year, week) from MM/DD/YYYY — the reference's day-of-year // 7."""
    month = F.substring(date_col, 1, 2).cast("int")
    day = F.substring(date_col, 4, 2).cast("int")
    year = F.substring(date_col, 7, 4).cast("int")
    days_before = F.element_at(
        F.array(*[F.lit(d) for d in DAYS_BEFORE]), month + 1
    )
    leap = (
        (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))
        & (month >= 3)
    ).cast("int")
    doy = day + days_before + leap
    return year.alias("year"), (doy / 7).cast("int").alias("week")


def make_sample_csv(path: str, n: int = 2000) -> None:
    boroughs = ["BROOKLYN", "QUEENS", "MANHATTAN", "BRONX", "STATEN ISLAND"]
    factors = ["Driver Inattention", "Failure to Yield", "Speeding",
               "Alcohol", "Fatigued", ""]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["DATE", "BOROUGH", "NUMBER OF PERSONS KILLED",
                    "CONTRIBUTING FACTOR VEHICLE 1",
                    "CONTRIBUTING FACTOR VEHICLE 2",
                    "CONTRIBUTING FACTOR VEHICLE 3",
                    "CONTRIBUTING FACTOR VEHICLE 4",
                    "CONTRIBUTING FACTOR VEHICLE 5"])
        for i in range(n):
            date = f"{(i % 12) + 1:02d}/{(i % 28) + 1:02d}/{2012 + i % 3}"
            w.writerow([
                date, boroughs[i % len(boroughs)], 1 if i % 17 == 0 else 0,
                factors[i % len(factors)], factors[(i * 3) % len(factors)],
                "", "", "",
            ])


def main(path: str) -> None:
    ctx = StreamContext(shuffle_partitions=8)
    src = (
        ctx.stream_csv(path, header=True)
        .map(
            date=F.col("DATE"),
            borough=F.col("BOROUGH"),
            killed=F.col("`NUMBER OF PERSONS KILLED`").cast("int"),
            factors=F.array_distinct(F.filter(
                F.array(*[
                    F.col(f"`CONTRIBUTING FACTOR VEHICLE {i}`")
                    for i in range(1, 6)
                ]),
                lambda x: x.isNotNull() & (x != ""),
            )),
        )
        .map("borough", "killed", "factors",
             *week_cols(F.col("date")))
        .cache()
    )

    # Q1: lethal accidents per week
    q1 = (
        src.map("year", "week", lethal=(F.col("killed") > 0).cast("int"))
        .group_by("year", "week")
        .sum("lethal", alias="lethal")
        .sorted_by(F.col("year"), F.col("week"))
    )
    print("Q1 lethal accidents per week (first 10):")
    for r in q1.limit(10).collect_vec():
        print(f"  {r.year}-w{r.week}: {r.lethal}")

    # Q2: accidents + lethality per contributing factor
    q2 = (
        src.map(lethal=(F.col("killed") > 0).cast("int"),
                factor=F.explode("factors"))
        .group_by("factor")
        .fold(accidents=F.count(F.lit(1)), kills=F.sum("lethal"))
        .map("factor", "accidents", "kills",
             pct=F.round(100.0 * F.col("kills") / F.col("accidents"), 2))
        .sorted_by(F.col("factor"))
    )
    print("Q2 per contributing factor:")
    for r in q2.collect_vec():
        print(f"  {r.factor:<22} {r.accidents}\t{r.pct}%")

    # Q3: per (borough, week) counts; the SAME stream split and
    # re-aggregated per (borough, week-of-year) with % lethal
    per_bw = (
        src.map("borough", "year", "week",
                lethal=(F.col("killed") > 0).cast("int"))
        .group_by("borough", "year", "week")
        .fold(accidents=F.count(F.lit(1)), killed=F.sum("lethal"))
    )
    branch_a, branch_b = per_bw.split(2)
    q3_weekly = branch_a.sorted_by(
        F.col("borough"), F.col("year"), F.col("week")
    )
    q3_avg = (
        branch_b.group_by("borough", "week")
        .fold(accidents=F.sum("accidents"), killed=F.sum("killed"))
        .map("borough", "week", "accidents", "killed",
             pct=F.round(100.0 * F.col("killed") / F.col("accidents"), 2))
        .sorted_by(F.col("borough"), F.col("week"))
    )
    print("Q3 per (borough, week) (first 5):")
    for r in q3_weekly.limit(5).collect_vec():
        print(f"  {r.borough} {r.year}-w{r.week}: {r.accidents} "
              f"({r.killed} lethal)")
    print("Q3 per (borough, week-of-year) averages (first 5):")
    for r in q3_avg.limit(5).collect_vec():
        print(f"  {r.borough} w{r.week}: {r.accidents} acc, {r.pct}% lethal")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        tmp = os.path.join(tempfile.mkdtemp(prefix="accidents_"), "acc.csv")
        make_sample_csv(tmp)
        main(tmp)
