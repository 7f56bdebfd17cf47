"""UD1 — skill extraction behind an interface (SURVEY.md §2.10).

The reference calls GPT-4o-mini per row to pull TECH:/SOFT: skill
lists out of a description (src/data_extract.py:108-135), guarded by
P6 (skip short text) and truncated to 4000 chars. That is the only
irreducible black-box function in the system.

Engine design:
- ``RuleSkillExtractor`` — deterministic keyword extractor with the
  same interface; the test/verification path.
- ``LLMSkillExtractor`` — batched external calls inside mapInPandas
  (one Arrow batch per request group); NEVER used in verification.
  The class exists so the production wiring is visible: rate limiting
  and batching happen per-partition, and mapInPandas itself is the
  reorder barrier — its output attributes are fresh, so Catalyst
  cannot push a downstream filter below the external call (the
  reference's cost control: filter + sample BEFORE extraction,
  SURVEY.md §4; plan-asserted in tests/test_plan_quality.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_TEXT_LEN = 30      # P6 guard (src/data_extract.py:109-110)
MAX_PROMPT_CHARS = 4000  # truncation (src/data_extract.py:117)

TECH_KEYWORDS = (
    "python", "sql", "java", "javascript", "aws", "azure", "gcp", "spark",
    "hadoop", "kafka", "docker", "kubernetes", "linux", "git", "c++",
    "scala", "tensorflow", "pytorch", "tableau", "excel",
)
SOFT_KEYWORDS = (
    "communication", "teamwork", "leadership", "collaboration",
    "problem solving", "adaptability", "creativity", "mentoring",
)

OUTPUT_SCHEMA = "technical_skills string, soft_skills string"


class RuleSkillExtractor:
    """Deterministic keyword matcher with the UD1 interface. Pure
    Column expressions (no UDF): keyword containment over the
    truncated, lowercased text, output as sorted ', '-joined lists —
    the same output contract as the LLM path."""

    def extract(self, df: DataFrame, text_col: str) -> DataFrame:
        guarded = F.when(
            F.length(F.trim(F.col(text_col))) >= MIN_TEXT_LEN,
            F.lower(F.substring(F.col(text_col), 1, MAX_PROMPT_CHARS)),
        )

        def match_list(keywords: tuple[str, ...]):
            hits = F.array(
                *[
                    F.when(guarded.contains(kw.lower()), F.lit(kw))
                    for kw in sorted(keywords)
                ]
            )
            return F.array_join(
                F.filter(hits, lambda x: x.isNotNull()), ", "
            )

        return df.withColumn(
            "technical_skills", F.coalesce(match_list(TECH_KEYWORDS), F.lit(""))
        ).withColumn(
            "soft_skills", F.coalesce(match_list(SOFT_KEYWORDS), F.lit(""))
        )


class LLMSkillExtractor:
    """Batched external-model extraction via mapInPandas. The client is
    injected (callable: list[str] -> list[tuple[str, str]]) so tests
    can pass a fake; production passes a real API client. Failures
    degrade to empty lists per row (the reference's contract)."""

    def __init__(self, client, batch_size: int = 32):
        self.client = client
        self.batch_size = batch_size

    def extract(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        import pandas as pd

        client, batch_size = self.client, self.batch_size
        schema = f"{id_col} long, " + OUTPUT_SCHEMA

        def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                texts = (
                    pdf[text_col].fillna("").str.slice(0, MAX_PROMPT_CHARS)
                )
                ok = texts.str.strip().str.len() >= MIN_TEXT_LEN
                out_tech = ["" for _ in range(len(pdf))]
                out_soft = ["" for _ in range(len(pdf))]
                idxs = [i for i, g in enumerate(ok.tolist()) if g]
                for s in range(0, len(idxs), batch_size):
                    chunk = idxs[s : s + batch_size]
                    try:
                        results = client([texts.iloc[i] for i in chunk])
                    except Exception:
                        results = [("", "")] * len(chunk)  # degrade, don't fail
                    for i, (tech, soft) in zip(chunk, results):
                        out_tech[i], out_soft[i] = tech, soft
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "technical_skills": out_tech,
                        "soft_skills": out_soft,
                    }
                )

        # mapInPandas is the reorder barrier: its output attributes are
        # fresh, so Catalyst cannot rewrite a downstream predicate in
        # terms of the input and push it below the external call (which
        # would change which rows get billed requests). Asserted by
        # tests/test_plan_quality.py::test_ud1_filter_stays_above_python_eval.
        return df.select(id_col, text_col).mapInPandas(run, schema)


def parse_tech_soft(reply: str) -> tuple[str, str]:
    """The reference's reply parser, verbatim semantics
    (src/data_extract.py:126-133): split on SOFT:, strip the TECH:
    tag and ' []\\n' framing from each side. Shared by the live
    client and the fake-client tests so the parsing contract is
    pinned regardless of which client runs."""
    tech, soft = "", ""
    if "TECH:" in reply:
        parts = reply.split("SOFT:")
        tech = parts[0].replace("TECH:", "").strip(" []\n")
        soft = parts[1].strip(" []\n") if len(parts) > 1 else ""
    return tech, soft


def build_prompt(text: str) -> str:
    """The reference's extraction prompt (src/data_extract.py:111-120)
    over pre-truncated text — truncation happens in the extractor's
    batch loop, not here."""
    return f"""
    Extract two comma-separated lists from this job description:
    1. Technical skills (languages, tools, frameworks)
    2. Soft skills (communication, teamwork, leadership, problem-solving)

    Description: {text}
    Format strictly as:
    TECH: [..]
    SOFT: [..]
    """


def openai_chat_client(model: str = "gpt-4o-mini",
                       temperature: float = 0.4):
    """Production client binding for :class:`LLMSkillExtractor`
    (VERDICT r9 stretch): a ``list[str] -> list[(tech, soft)]``
    callable over the public OpenAI chat API, matching the
    reference's call shape (src/data_extract.py:108-135: gpt-4o-mini,
    temperature 0.4, one request per description, per-row degrade to
    empty on failure). Import- and env-gated: raises RuntimeError
    with a clear message when the ``openai`` package or
    ``OPENAI_API_KEY`` is absent, so the engine itself never needs
    network — tests inject fakes, and the live smoke test
    (tests/test_scale_ops.py) skips without a key."""
    import os

    if not os.environ.get("OPENAI_API_KEY"):
        raise RuntimeError(
            "OPENAI_API_KEY not set — LLMSkillExtractor's live path "
            "needs a real endpoint; inject a fake client instead"
        )
    try:
        from openai import OpenAI  # modern SDK
    except ImportError:
        try:
            import openai  # legacy SDK, the reference's import
        except ImportError as e:
            raise RuntimeError(
                "the 'openai' package is not installed in this "
                "environment"
            ) from e
        OpenAI = None  # noqa: N806

    if OpenAI is not None:
        api = OpenAI()

        def one(prompt: str) -> str:
            res = api.chat.completions.create(
                model=model,
                messages=[{"role": "user", "content": prompt}],
                temperature=temperature,
            )
            return res.choices[0].message.content or ""
    else:
        def one(prompt: str) -> str:
            res = openai.ChatCompletion.create(
                model=model,
                messages=[{"role": "user", "content": prompt}],
                temperature=temperature,
            )
            return res.choices[0].message["content"]

    def client(texts: list[str]) -> list[tuple[str, str]]:
        out = []
        for t in texts:
            try:
                out.append(parse_tech_soft(one(build_prompt(t))))
            except Exception:
                out.append(("", ""))  # reference contract: degrade
        return out

    return client
