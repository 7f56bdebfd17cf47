from .text import (  # noqa: F401
    normalize_text,
    clean_job_title,
    normalize_skill_list,
    city_from_location,
)
from .jobtype import infer_job_type  # noqa: F401
from .salary import normalize_salary, parse_numeric  # noqa: F401
from .dates import parse_timestamp, year_of, month_of, day_of  # noqa: F401
from .sentinels import fill_sentinels, SENTINELS  # noqa: F401
