from yaii_ray.query.dsl import (
    All,
    And,
    Not,
    Number,
    NumberRange,
    Or,
    Present,
    Query,
    Token,
    all_query,
    and_query,
    not_query,
    number,
    number_range,
    or_query,
    present,
    token,
)
from yaii_ray.query.ir import (
    ALL_EXP,
    AllExp,
    BoolExp,
    Exp,
    NoneExp,
    TermExp,
    TermRangeExp,
    build_expression,
)

__all__ = [
    "Query", "Token", "All", "And", "Or", "Not", "Number", "NumberRange",
    "Present", "token", "all_query", "and_query", "or_query", "not_query",
    "number", "number_range", "present",
    "Exp", "TermExp", "TermRangeExp", "BoolExp", "AllExp", "NoneExp",
    "ALL_EXP", "build_expression",
]
