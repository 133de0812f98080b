"""Andl builtin scalar functions → JVM-side Spark expressions.

Reference: Andl.Runtime/Builtin.cs — string, date/time, logical and
conversion builtins. Every mapping here stays inside whole-stage
codegen (pyspark.sql.functions only, zero Python UDFs) so these are
safe in the hot path of a 100 TB scan.

Andl name (Builtin.cs)  →  here
  left right fill trim tolower toupper length before after format
  =~ (regex match)  now dateymd year month day dow daysdiff
  num/text/bool conversions, bget/bset/blength binary ops
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---- text (Builtin.cs: Left/Right/Fill/Trim/ToLower/ToUpper/Length/Before/After/Format)

def left(col, n: int) -> Column:
    """First n chars, space-padded to width n when shorter
    (Builtin.cs:917-921 PadRight — rpad truncates or pads exactly so)."""
    return F.rpad(_c(col), n, " ")


def right(col, n: int) -> Column:
    """Last n chars, space-padded on the left when shorter
    (Builtin.cs:926-930 PadLeft; lpad alone would truncate keeping the
    FIRST n chars, so the long case takes the tail substring)."""
    c = _c(col)
    return F.when(F.length(c) >= n, F.substring(c, -n, n)).otherwise(F.lpad(c, n, " "))


def fill(col, n) -> Column:
    """fill('.', n): string repeated to length n (Builtin.cs Fill)."""
    return F.substring(F.repeat(_c(col), 1000), 1, n) if isinstance(n, int) else F.expr(
        f"substring(repeat({col!r}, 1000), 1, {n})"
    )


def trim(col) -> Column:
    return F.trim(_c(col))


def tolower(col) -> Column:
    return F.lower(_c(col))


def toupper(col) -> Column:
    return F.upper(_c(col))


def length(col) -> Column:
    return F.length(_c(col))


def before(col, sep: str) -> Column:
    """Text before the first occurrence of sep ('' if absent)."""
    c = _c(col)
    return F.when(F.instr(c, sep) > 0, F.substring_index(c, sep, 1)).otherwise(F.lit(""))


def after(col, sep: str) -> Column:
    """Text after the first occurrence of sep ('' if absent)."""
    c = _c(col)
    pos = F.instr(c, sep)
    return F.when(pos > 0, F.substring(c, pos + F.lit(len(sep)), F.length(c))).otherwise(F.lit(""))


def matches(col, pattern: str) -> Column:
    """Andl `=~` regular-expression match."""
    return _c(col).rlike(pattern)


def format_number(col, digits: int = 2) -> Column:
    return F.format_number(_c(col), digits)


# ---- date/time (Builtin.cs: Now/FromYmd/Year/Month/Day/DayOfWeek/DaysDifference)

def now() -> Column:
    return F.current_timestamp()


def dateymd(y, m, d) -> Column:
    return F.make_date(_c(y), _c(m), _c(d))


def year(col) -> Column:
    return F.year(_c(col))


def month(col) -> Column:
    return F.month(_c(col))


def day(col) -> Column:
    return F.day(_c(col))


def dow(col) -> Column:
    return F.dayofweek(_c(col))


def daysdiff(a, b) -> Column:
    return F.datediff(_c(a), _c(b))


# ---- binary (Builtin.cs: BinaryGet/BinarySet/BinaryLength)

def blength(col) -> Column:
    return F.length(_c(col))


def bget(col, i: int) -> Column:
    """Byte at 0-based index i of a binary column (Builtin.cs BinaryGet):
    binary-safe — slice the raw byte and read it through hex, no string
    decode in the path."""
    return F.conv(F.hex(F.substring(_c(col), i + 1, 1)), 16, 10).cast("long")


def bset(col, i: int, v: int) -> Column:
    """New binary with byte i replaced by v (Builtin.cs BinarySet —
    value semantics: the input column is untouched)."""
    b = _c(col)
    byte = F.unhex(F.lpad(F.hex(F.lit(int(v) & 0xFF)), 2, "0"))
    return F.concat(F.substring(b, 1, i), byte, F.substring(b, i + 2, 1 << 30))


# ---- conversions (Builtin.cs: Number/Text/Bool/Time)

def to_number(col) -> Column:
    return _c(col).cast("double")


def to_text(col) -> Column:
    return _c(col).cast("string")


def to_bool(col) -> Column:
    return _c(col).cast("boolean")
