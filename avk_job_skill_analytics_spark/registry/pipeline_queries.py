"""The full curation pipeline as one oracle-verified query.

Synthesizes the reference's dirty raw-jobs table from ``orders``
columns (identically in Spark and SQL), then runs the ENTIRE
transform stage (SURVEY.md §3.2: casts → normalize → title clean →
type inference → fills → skill normalize → keep-first dedup → salary
band → derived cols) through ``plans.pipeline.curate``. The oracle
replays the same chain in DuckDB SQL — one end-to-end value-parity
check over the composed pipeline, on top of the per-operator checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans import pipeline
from ..plans.schemas import load

QUERIES = {}
ORACLES = {}

_TITLE_CLEAN_SQL = """trim(regexp_replace(
  regexp_replace(
    regexp_replace(
      regexp_replace(
        (string_split_regex(
           regexp_replace(lower(job_title),
             '\\(.*?\\)|\\[.*?\\]|\\{.*?\\}', ' ', 'g'),
           '[-#|/]'))[1],
        '\\b[ivx]+\\b', ' ', 'g'),
      '\\b(senior|sr|jr|junior|lead|principal|chief|head|manager|director|vp|intern|internship|contract|temporary|temp|remote|hybrid|onsite|staff|associate|entry|level|mid)\\b',
      ' ', 'g'),
    '[^a-z ]', ' ', 'g'),
  '\\s+', ' ', 'g'))"""

_TYPE_INFER_SQL = """coalesce(nullif(concat_ws(', ',
  CASE WHEN regexp_matches(type_src, '(?i)\\bcontract(or)?\\b') THEN 'Contract' END,
  CASE WHEN regexp_matches(type_src, '(?i)\\bfreelanc(e|er|ing)\\b') THEN 'Freelance' END,
  CASE WHEN regexp_matches(type_src, '(?i)\\bfull[\\s_-]?time\\b|\\bft\\b') THEN 'Full-Time' END,
  CASE WHEN regexp_matches(type_src, '(?i)\\bintern(ship)?\\b') THEN 'Internship' END,
  CASE WHEN regexp_matches(type_src, '(?i)\\bpart[\\s_-]?time\\b|\\bpt\\b') THEN 'Part-Time' END,
  CASE WHEN regexp_matches(type_src, '(?i)\\btemp(orary)?\\b') THEN 'Temporary' END), ''),
  'Not specified')"""

_SKILL_NORM_SQL = """CASE WHEN {c} IS NULL OR trim({c}) = '' THEN 'not listed'
  ELSE coalesce(nullif(array_to_string(
    list_transform(list_filter(string_split({c}, ','), x -> trim(x) <> ''),
                   x -> lower(trim(x))), ', '), ''), 'not listed') END"""

_SOFT_PREFILL = ("(CASE WHEN soft_skills IS NULL OR trim(soft_skills) = '' "
                 "THEN 'communication, teamwork' ELSE soft_skills END)")
_TECH_NORM = _SKILL_NORM_SQL.format(c="technical_skills")
_SOFT_NORM = _SKILL_NORM_SQL.format(c=_SOFT_PREFILL)

_PIPELINE_SQL = f"""
WITH raw AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE o_orderstatus END AS company_name,
         concat(o_orderpriority, ' Engineer II - ', o_orderstatus, ' (Remote)') AS job_title,
         CASE o_orderkey % 4 WHEN 0 THEN 'full-time' WHEN 1 THEN 'part time intern'
              WHEN 2 THEN '' ELSE 'contractor temp' END AS job_type,
         CASE WHEN o_orderkey % 2 = 0 THEN concat(o_orderstatus, ', ', o_orderpriority)
              ELSE o_orderstatus END AS job_location,
         'usa' AS country,
         CASE o_orderkey % 3 WHEN 0 THEN concat('$', CAST(o_totalprice AS VARCHAR))
              WHEN 1 THEN CAST(o_totalprice / 10000 AS VARCHAR)
              ELSE 'N/A' END AS salary,
         CASE WHEN o_orderkey % 11 = 0 THEN 'not a date'
              ELSE CAST(o_orderdate AS VARCHAR) END AS job_posted_date,
         CASE WHEN o_orderkey % 10 < 8 THEN 'Indeed' ELSE 'Zip Recruiter' END AS job_posted_site,
         CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE 'Python, SQL , spark,,AWS' END AS technical_skills,
         '' AS soft_skills
  FROM orders),
typed AS (
  SELECT rid,
         lower(trim(company_name)) AS company_name,
         lower(trim(job_title)) AS job_title,
         job_type,
         lower(trim(job_location)) AS job_location,
         lower(trim(country)) AS country,
         lower(trim(job_posted_site)) AS job_posted_site,
         TRY_CAST(job_posted_date AS TIMESTAMP) AS job_posted_date,
         CAST(floor(CASE WHEN num <= 1000 THEN num * 2000 ELSE num END) AS INTEGER) AS salary,
         technical_skills, soft_skills
  FROM (SELECT *, TRY_CAST(regexp_replace(salary, '[$,]', '', 'g') AS DOUBLE) AS num
        FROM raw) r),
cleaned AS (
  SELECT *,
         {_TITLE_CLEAN_SQL} AS cleaned_job_title,
         concat_ws(' ', job_type, job_title) AS type_src
  FROM typed),
inferred AS (
  SELECT rid, company_name, job_title, cleaned_job_title, job_location,
         country, job_posted_site, job_posted_date, salary,
         {_TYPE_INFER_SQL} AS job_type,
         technical_skills, soft_skills
  FROM cleaned),
filled AS (
  SELECT rid, job_title, cleaned_job_title, job_location, job_posted_site,
         job_posted_date, salary, job_type,
         CASE WHEN company_name IS NULL OR trim(company_name) = ''
              THEN 'Unknown' ELSE company_name END AS company_name,
         CASE WHEN country IS NULL OR trim(country) = ''
              THEN 'United States' ELSE country END AS country,
         {_TECH_NORM} AS technical_skills,
         {_SOFT_NORM} AS soft_skills
  FROM inferred),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY company_name, job_title, job_location, job_posted_site
      ORDER BY rid) AS rn
    FROM filled) t
  WHERE rn = 1)
SELECT rid, company_name, cleaned_job_title, job_type, salary,
       technical_skills, soft_skills,
       CAST(year(job_posted_date) AS BIGINT) AS job_posted_year,
       CASE WHEN contains(job_location, ',')
            THEN trim(string_split(job_location, ',')[1])
            ELSE job_location END AS city
FROM deduped
WHERE salary BETWEEN 20000 AND 400000
"""


def pipeline_curate(spark, sf_dir):
    """Full transform-stage pipeline over a synthesized dirty raw-jobs
    table (src/transform.py:99-150 end-to-end; see module docstring)."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = o.select(
        k.alias("rid"),
        F.when(k % 7 == 0, F.lit("")).otherwise(F.col("o_orderstatus")).alias("company_name"),
        F.concat(F.col("o_orderpriority"), F.lit(" Engineer II - "),
                 F.col("o_orderstatus"), F.lit(" (Remote)")).alias("job_title"),
        F.when(k % 4 == 0, F.lit("full-time"))
         .when(k % 4 == 1, F.lit("part time intern"))
         .when(k % 4 == 2, F.lit(""))
         .otherwise(F.lit("contractor temp")).alias("job_type"),
        F.when(k % 2 == 0,
               F.concat(F.col("o_orderstatus"), F.lit(", "), F.col("o_orderpriority")))
         .otherwise(F.col("o_orderstatus")).alias("job_location"),
        F.lit("usa").alias("country"),
        F.when(k % 3 == 0, F.concat(F.lit("$"), F.col("o_totalprice").cast("string")))
         .when(k % 3 == 1, (F.col("o_totalprice") / 10000).cast("string"))
         .otherwise(F.lit("N/A")).alias("salary"),
        F.when(k % 11 == 0, F.lit("not a date"))
         .otherwise(F.col("o_orderdate").cast("string")).alias("job_posted_date"),
        F.when(k % 10 < 8, F.lit("Indeed"))
         .otherwise(F.lit("Zip Recruiter")).alias("job_posted_site"),
        F.when(k % 5 == 0, F.lit(""))
         .otherwise(F.lit("Python, SQL , spark,,AWS")).alias("technical_skills"),
        F.lit("").alias("soft_skills"),
    )
    curated = pipeline.curate(raw, order=[F.asc("rid")], title_case=False)
    return curated.select(
        "rid", "company_name", "cleaned_job_title", "job_type", "salary",
        "technical_skills", "soft_skills",
        F.col("job_posted_year").cast("long").alias("job_posted_year"),
        "city",
    )


QUERIES["pipeline_curate"] = pipeline_curate
ORACLES["pipeline_curate"] = _PIPELINE_SQL
