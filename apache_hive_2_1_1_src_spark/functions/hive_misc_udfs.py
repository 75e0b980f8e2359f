"""Hive misc scalar UDFs absent from Spark's builtin registry.

Python ports of the reference semantics, registered lazily by the
session when a statement references them:

* mask family — ``ql/src/java/.../generic/GenericUDFMask.java``,
  ``GenericUDFMaskFirstN/LastN/ShowFirstN/ShowLastN/MaskHash.java``:
  per-character category masking (Lu→'X', Ll→'x', Nd→'n' by default),
  whole-number digit replacement, 1900-based date component masking,
  md5-hex string hashing.
* in_file — ``ql/src/java/.../udf/generic/GenericUDFInFile.java``:
  line-set membership against a local file.
* qtest_get_java_boolean — the reference test jar's
  ``GenericUDFTestGetJavaBoolean`` (QTestUtil pre-registers it).
* hive_tz_norm — Java ``TimeZone.getTimeZone`` falls back to GMT for
  an unparseable id (udf_from_utc_timestamp.q's '' / '---'); Spark
  raises INVALID_TIMEZONE, so timezone args normalize through this.
"""

from __future__ import annotations

import hashlib
import os
import re
import unicodedata
from datetime import date

_REF_FILES = "/root/reference/data/files"

# Java-style defaults (GenericUDFMask.java MASKED_* constants)
_UPPER, _LOWER, _DIGIT, _OTHER, _NUMBER = "X", "x", "n", -1, 1


def _char_arg(v, default):
    """getCharArg: string → first char, int → codepoint (-1 unmasked)."""
    if v is None:
        return default
    if isinstance(v, str):
        return v[0] if v else default
    try:
        iv = int(v)
    except (TypeError, ValueError):
        return default
    return -1 if iv == -1 else chr(iv) if iv >= 0 else default


def _int_arg(v, default):
    if v is None:
        return default
    try:
        return int(str(v))
    except (TypeError, ValueError):
        return default


def _transform_char(ch: str, upper, lower, digit, other) -> str:
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return upper if upper != -1 else ch
    if cat == "Ll":
        return lower if lower != -1 else ch
    if cat == "Nd":
        return digit if digit != -1 else ch
    return other if other != -1 else ch


def _wrap_width(v: int, width) -> int:
    """Java's byte/short/int arithmetic overflows silently in the mask
    transformers ((byte)555 == 43 — udf_mask_first_n.q golden)."""
    if not width:
        return v
    bits = int(width)
    m = 1 << bits
    v &= m - 1
    return v - m if v >= (m >> 1) else v


def _mask_number(val: int, masked_number: int) -> int:
    """Every decimal digit → masked_number, sign preserved
    (MaskTransformer.transform(Long))."""
    neg = val < 0
    v = -val if neg else val
    ret, pos = 0, 1
    while v != 0:
        ret += masked_number * pos
        v //= 10
        pos *= 10
    return -ret if neg else ret


def _mask_number_range(val: int, masked_number: int, keep_low: int) -> int:
    """Digits at positions >= keep_low (from least significant) are
    masked; lower positions kept (FirstN's retainCount logic)."""
    neg = val < 0
    v = -val if neg else val
    ret, pos, i = 0, 1, 0
    while v != 0:
        d = masked_number if i >= keep_low else v % 10
        ret += d * pos
        v //= 10
        pos *= 10
        i += 1
    return -ret if neg else ret


def _digit_count(val: int) -> int:
    v = -val if val < 0 else val
    n = 0
    while v != 0:
        n += 1
        v //= 10
    return n


def _base_args(args):
    upper = _char_arg(args[0] if len(args) > 0 else None, _UPPER)
    lower = _char_arg(args[1] if len(args) > 1 else None, _LOWER)
    digit = _char_arg(args[2] if len(args) > 2 else None, _DIGIT)
    other = _char_arg(args[3] if len(args) > 3 else None, _OTHER)
    number = _int_arg(args[4] if len(args) > 4 else None, _NUMBER)
    if number < 0 or number > 9:
        number = _NUMBER
    return upper, lower, digit, other, number


def _fmt(v):
    if v is None:
        return None
    if isinstance(v, date):
        return v.isoformat()
    return str(v)




def _mask_date(value, args):
    day = _int_arg(args[5] if len(args) > 5 else None, 1)
    month = _int_arg(args[6] if len(args) > 6 else None, 0)
    year = _int_arg(args[7] if len(args) > 7 else None, 0)
    if day != -1 and not (1 <= day <= 31):
        day = 1
    if month != -1 and not (0 <= month <= 11):
        month = 0
    y = value.year if year == -1 else 1900 + year
    m = value.month if month == -1 else month + 1
    d = value.day if day == -1 else day
    try:
        return date(y, m, d).isoformat()
    except ValueError:
        return None


def hive_mask(value, *args):
    width = args[8] if len(args) > 8 else None
    if value is None:
        return None
    upper, lower, digit, other, number = _base_args(args)
    day = _int_arg(args[5] if len(args) > 5 else None, 1)
    month = _int_arg(args[6] if len(args) > 6 else None, 0)
    year = _int_arg(args[7] if len(args) > 7 else None, 0)
    if day != -1 and not (1 <= day <= 31):
        day = 1
    if month != -1 and not (0 <= month <= 11):
        month = 0
    if isinstance(value, str):
        return "".join(
            _transform_char(c, upper, lower, digit, other) for c in value
        )
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        return str(_wrap_width(_mask_number(value, number), width))
    if isinstance(value, date):
        # java.sql.Date components: getYear() is 1900-based,
        # getMonth() 0-based (MaskTransformer.transform(Date))
        y = value.year if year == -1 else 1900 + year
        m = value.month if month == -1 else month + 1
        d = value.day if day == -1 else day
        try:
            return date(y, m, d).isoformat()
        except ValueError:
            return None
    return None


def hive_mask_first_n(value, n, *args):
    width = args[5] if len(args) > 5 else None
    if value is None:
        return None
    if isinstance(value, date):
        return _mask_date(value, list(args))
    cnt = _int_arg(n, 4)
    if cnt < 0:
        cnt = 0
    upper, lower, digit, other, number = _base_args(args)
    if isinstance(value, str):
        end = min(len(value), cnt)
        return (
            "".join(
                _transform_char(c, upper, lower, digit, other)
                for c in value[:end]
            )
            + value[end:]
        )
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        dc = _digit_count(value)
        keep_low = 0 if dc < cnt else dc - cnt
        return str(
            _wrap_width(_mask_number_range(value, number, keep_low), width)
        )
    return None


def hive_mask_last_n(value, n, *args):
    width = args[5] if len(args) > 5 else None
    if value is None:
        return None
    if isinstance(value, date):
        return _mask_date(value, list(args))
    cnt = _int_arg(n, 4)
    if cnt < 0:
        cnt = 0
    upper, lower, digit, other, number = _base_args(args)
    if isinstance(value, str):
        start = max(0, len(value) - cnt)
        return value[:start] + "".join(
            _transform_char(c, upper, lower, digit, other)
            for c in value[start:]
        )
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        # mask the LOWEST min(cnt, digits) positions
        neg = value < 0
        v = -value if neg else value
        ret, pos, i = 0, 1, 0
        number_ = number
        while v != 0:
            d = number_ if i < cnt else v % 10
            ret += d * pos
            v //= 10
            pos *= 10
            i += 1
        return str(_wrap_width(-ret if neg else ret, width))
    return None


def hive_mask_show_first_n(value, n, *args):
    width = args[5] if len(args) > 5 else None
    if value is None:
        return None
    if isinstance(value, date):
        return _mask_date(value, list(args))
    cnt = _int_arg(n, 4)
    if cnt < 0:
        cnt = 0
    upper, lower, digit, other, number = _base_args(args)
    if isinstance(value, str):
        if len(value) <= cnt:
            return value
        return value[:cnt] + "".join(
            _transform_char(c, upper, lower, digit, other)
            for c in value[cnt:]
        )
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        dc = _digit_count(value)
        mask_count = dc - cnt
        if mask_count <= 0:
            return str(value)
        # mask the LOWEST mask_count digits (ShowFirstN masks from end)
        neg = value < 0
        v = -value if neg else value
        ret, pos, i = 0, 1, 0
        while v != 0:
            d = number if i < mask_count else v % 10
            ret += d * pos
            v //= 10
            pos *= 10
            i += 1
        return str(_wrap_width(-ret if neg else ret, width))
    return None


def hive_mask_show_last_n(value, n, *args):
    width = args[5] if len(args) > 5 else None
    if value is None:
        return None
    if isinstance(value, date):
        return _mask_date(value, list(args))
    cnt = _int_arg(n, 4)
    if cnt < 0:
        cnt = 0
    upper, lower, digit, other, number = _base_args(args)
    if isinstance(value, str):
        if len(value) <= cnt:
            return value
        keep_from = len(value) - cnt
        return (
            "".join(
                _transform_char(c, upper, lower, digit, other)
                for c in value[:keep_from]
            )
            + value[keep_from:]
        )
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        dc = _digit_count(value)
        if dc <= cnt:
            return str(value)
        keep_low = cnt
        return str(
            _wrap_width(_mask_number_range(value, number, keep_low), width)
        )
    return None


def hive_mask_hash(value):
    if value is None:
        return None
    if isinstance(value, str):
        return hashlib.md5(value.encode("utf-8")).hexdigest()
    return None  # numbers/dates hash to NULL (MaskHashTransformer)


_IN_FILE_CACHE: dict[str, frozenset] = {}


def hive_in_file(value, path):
    if value is None or path is None:
        return None
    p = str(path)
    if p.startswith("../../data/files"):
        p = _REF_FILES + p[len("../../data/files"):]
    lines = _IN_FILE_CACHE.get(p)
    if lines is None:
        try:
            with open(p, encoding="utf-8") as fh:
                lines = frozenset(ln.rstrip("\r\n") for ln in fh)
        except OSError:
            lines = frozenset()
        _IN_FILE_CACHE[p] = lines
    return str(value) in lines


def hive_tz_norm(tz):
    if tz is None:
        return None
    t = str(tz).strip()
    if re.match(r"^[A-Za-z]+(?:[_-][A-Za-z0-9+-]+)*(?:/[\w+-]+)+$", t):
        return t  # region id shape (Area/City)
    if re.match(r"^(GMT|UTC)?[+-]\d{1,2}(:?\d{2})?$", t):
        return t
    if re.match(r"^(GMT|UTC)$", t, re.IGNORECASE):
        return t
    if re.match(r"^[A-Za-z]{3}$", t):
        return t  # 3-letter abbreviation (PST...)
    return "UTC"  # Java TimeZone.getTimeZone falls back to GMT




def _java_week_parts(d):
    """GregorianCalendar Locale.US week fields: weeks start SUNDAY,
    minimalDaysInFirstWeek=1 (udf_date_format.q 'w'=15 for
    2015-04-08)."""
    from datetime import date as _d, timedelta as _td

    def _sun_idx(x):
        return (x.weekday() + 1) % 7  # Sunday → 0

    nxt = _d(d.year + 1, 1, 1)
    start_next_w1 = nxt - _td(days=_sun_idx(nxt))
    if d >= start_next_w1:
        return 1, d.year + 1
    jan1 = _d(d.year, 1, 1)
    off = _sun_idx(jan1)
    doy = d.timetuple().tm_yday
    return (doy + off - 1) // 7 + 1, d.year


def hive_date_format(value, fmt):
    """date_format with Java SimpleDateFormat semantics for the fields
    Spark's CORRECTED parser rejects (Y week-year, w/W week numbers,
    S raw milliseconds) — UDFDateFormat.java delegates to
    SimpleDateFormat."""
    import datetime as _dt

    if value is None or fmt is None:
        return None
    v = value
    if isinstance(v, str):
        m = re.match(
            r"\s*(\d{1,4})-(\d{1,2})-(\d{1,2})"
            r"(?:[ T](\d{1,2})(?::(\d{1,2})(?::(\d{1,2})"
            r"(?:\.(\d+))?)?)?)?",
            v,
        )
        if not m:
            return None
        frac = (m.group(7) or "").ljust(3, "0")[:3]
        try:
            v = _dt.datetime(
                int(m.group(1)), int(m.group(2)), int(m.group(3)),
                int(m.group(4) or 0), int(m.group(5) or 0),
                int(m.group(6) or 0), int(frac) * 1000,
            )
        except ValueError:
            return None
    if isinstance(v, _dt.datetime):
        d, t = v.date(), v
    elif isinstance(v, _dt.date):
        d, t = v, _dt.datetime(v.year, v.month, v.day)
    else:
        return None
    months = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
    days = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]
    out, i = [], 0
    while i < len(fmt):
        c = fmt[i]
        if c == "'":
            j = fmt.find("'", i + 1)
            if j == i + 1:
                out.append("'")
                i += 2
                continue
            out.append(fmt[i + 1 : j if j != -1 else len(fmt)])
            i = (j + 1) if j != -1 else len(fmt)
            continue
        if not c.isalpha():
            out.append(c)
            i += 1
            continue
        j = i
        while j < len(fmt) and fmt[j] == c:
            j += 1
        n = j - i
        if c == "G":
            out.append("AD")
        elif c in "yY":
            if c == "Y":
                _, yr = _java_week_parts(d)
            else:
                yr = d.year
            out.append(str(yr % 100).zfill(2) if n == 2 else str(yr).zfill(n))
        elif c == "M":
            if n >= 4:
                out.append(months[d.month - 1])
            elif n == 3:
                out.append(months[d.month - 1][:3])
            else:
                out.append(str(d.month).zfill(n))
        elif c == "w":
            wk, _ = _java_week_parts(d)
            out.append(str(wk).zfill(n))
        elif c == "W":
            first = d.replace(day=1)
            off = (first.weekday() + 1) % 7
            out.append(str((d.day + off - 1) // 7 + 1).zfill(n))
        elif c == "D":
            out.append(str(d.timetuple().tm_yday).zfill(n))
        elif c == "d":
            out.append(str(d.day).zfill(n))
        elif c == "E":
            nm = days[d.weekday()]
            out.append(nm if n >= 4 else nm[:3])
        elif c == "u":
            out.append(str(d.weekday() + 1).zfill(n))
        elif c == "H":
            out.append(str(t.hour).zfill(n))
        elif c == "k":
            out.append(str(t.hour or 24).zfill(n))
        elif c == "h":
            out.append(str(((t.hour + 11) % 12) + 1).zfill(n))
        elif c == "K":
            out.append(str(t.hour % 12).zfill(n))
        elif c == "m":
            out.append(str(t.minute).zfill(n))
        elif c == "s":
            out.append(str(t.second).zfill(n))
        elif c == "S":
            out.append(str(t.microsecond // 1000).zfill(n))
        elif c == "a":
            out.append("PM" if t.hour >= 12 else "AM")
        elif c in "zv":
            out.append("UTC")
        elif c == "Z":
            out.append("+0000")
        else:
            # SimpleDateFormat throws on an unknown pattern letter and
            # UDFDateFormat returns NULL ('Q' — udf_date_format.q)
            return None
        i = j
    return "".join(out)




def hive_reflect2(value, method, p1=None, p2=None, tz=None):
    """reflect2 (GenericUDFReflect2.java): invoke a Java instance
    method on the value's writable.  The common String/Integer/
    Timestamp methods from udf_reflect2.q, with java.sql.Timestamp's
    1900-based getYear / 0-based getMonth / day-of-week getDay."""
    import datetime as _dt

    if value is None or method is None:
        return None

    def _wrap(v, bits):
        m = 1 << bits
        v &= m - 1
        return v - m if v >= (m >> 1) else v

    try:
        if isinstance(value, bool):
            return str(value).lower()
        if isinstance(value, int):
            if method == "byteValue":
                return str(_wrap(value, 8))
            if method == "shortValue":
                return str(_wrap(value, 16))
            if method == "intValue":
                return str(_wrap(value, 32))
            if method == "longValue":
                return str(value)
            if method in ("floatValue", "doubleValue"):
                return f"{float(value):.1f}" if float(value) == int(
                    value
                ) else str(float(value))
            if method == "toString":
                return str(value)
            if method == "hashCode":
                return str(_wrap(value, 32))
            return None
        if isinstance(value, str):
            if method == "concat":
                return value + (p1 or "")
            if method == "contains":
                return str(p1 in value).lower()
            if method == "startsWith":
                return str(value.startswith(p1 or "")).lower()
            if method == "endsWith":
                return str(value.endswith(p1 or "")).lower()
            if method == "equals":
                return str(value == p1).lower()
            if method == "equalsIgnoreCase":
                return str(value.lower() == (p1 or "").lower()).lower()
            if method == "getBytes":
                return value  # raw bytes of an ASCII string print as-is
            if method == "indexOf":
                return str(value.find(str(p1)))
            if method == "lastIndexOf":
                return str(value.rfind(str(p1)))
            if method == "replace":
                return value.replace(str(p1), str(p2))
            if method == "substring":
                if p2 is None:
                    return value[int(p1):]
                return value[int(p1):int(p2)]
            if method == "toUpperCase":
                return value.upper()
            if method == "toLowerCase":
                return value.lower()
            if method == "trim":
                return value.strip()
            if method == "length":
                return str(len(value))
            if method == "toString":
                return value
            if method == "hashCode":
                h = 0
                for ch in value:
                    h = _wrap(31 * h + ord(ch), 32)
                return str(h)
            return None
        if isinstance(value, _dt.datetime):
            loc = value
            if tz is not None and value.tzinfo is None:
                # python workers hand over the instant as a NAIVE UTC
                # datetime; java.sql.Timestamp getters answer in the
                # SESSION zone
                try:
                    from zoneinfo import ZoneInfo

                    loc = value.replace(tzinfo=_dt.timezone.utc).astimezone(
                        ZoneInfo(tz)
                    )
                except Exception:
                    loc = value
            if method == "getYear":
                return str(loc.year - 1900)
            if method == "getMonth":
                return str(loc.month - 1)
            if method == "getDay":
                # java.util.Date.getDay: day of week, Sunday=0
                return str((loc.weekday() + 1) % 7)
            if method == "getDate":
                return str(loc.day)
            if method == "getHours":
                return str(loc.hour)
            if method == "getMinutes":
                return str(loc.minute)
            if method == "getSeconds":
                return str(loc.second)
            if method == "getTime":
                epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
                if value.tzinfo is None:
                    epoch = _dt.datetime(1970, 1, 1)
                return str(
                    int((value - epoch).total_seconds() * 1000)
                )
            return None
    except (TypeError, ValueError):
        return None
    return None


def register(spark) -> None:
    from pyspark.sql import functions as SF
    from pyspark.sql import types as T

    def _audf(fn, rt):
        """Arrow-serialized scalar UDF (optimization guide §4.3): same
        per-row call semantics, but batches cross the JVM↔Python
        boundary as Arrow instead of pickled rows — the plan node
        becomes ArrowEvalPython instead of BatchEvalPython, so a
        masking POLICY over a large scan no longer pays row-pickling.
        Every function here returns str/bool/None matching its declared
        type exactly, so the Arrow/pickle coercion differences are
        moot.  Falls back to the pickle path on builds without
        useArrow."""
        try:
            return SF.udf(fn, rt, useArrow=True)
        except TypeError:
            return SF.udf(fn, rt)

    # fixed-arity shims: the session rewrite pads call sites to these
    spark.udf.register(
        "hive_mask",
        _audf(
            lambda v, a, b, c, d, e, f, g, h, w: hive_mask(
                v, a, b, c, d, e, f, g, h, w
            ),
            T.StringType(),
        ),
    )
    for nm, fn in (
        ("hive_mask_first_n", hive_mask_first_n),
        ("hive_mask_last_n", hive_mask_last_n),
        ("hive_mask_show_first_n", hive_mask_show_first_n),
        ("hive_mask_show_last_n", hive_mask_show_last_n),
    ):
        spark.udf.register(
            nm,
            _audf(
                (
                    lambda f: lambda v, n, a, b, c, d, e, w: f(
                        v, n, a, b, c, d, e, w
                    )
                )(fn),
                T.StringType(),
            ),
        )
    spark.udf.register("mask_hash", _audf(hive_mask_hash, T.StringType()))
    # bare-name registry aliases so DESCRIBE FUNCTION <name> resolves —
    # executable call sites are rewritten to the hive_* shims above
    spark.udf.register(
        "mask_first_n",
        _audf(lambda v, n: hive_mask_first_n(v, n), T.StringType()),
    )
    spark.udf.register(
        "mask_last_n",
        _audf(lambda v, n: hive_mask_last_n(v, n), T.StringType()),
    )
    spark.udf.register(
        "mask_show_first_n",
        _audf(lambda v, n: hive_mask_show_first_n(v, n), T.StringType()),
    )
    spark.udf.register(
        "mask_show_last_n",
        _audf(lambda v, n: hive_mask_show_last_n(v, n), T.StringType()),
    )
    spark.udf.register(
        "field", lambda v, a: None, T.IntegerType()
    )
    spark.udf.register(
        "index", lambda a, i: None, T.StringType()
    )
    spark.udf.register(
        "in_file_desc_alias", _audf(hive_in_file, T.BooleanType())
    )
    spark.udf.register("in_file", _audf(hive_in_file, T.BooleanType()))
    spark.udf.register(
        "hive_date_format", _audf(hive_date_format, T.StringType())
    )
    try:
        _sess_tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        _sess_tz = "UTC"
    spark.udf.register(
        "hive_reflect2",
        _audf(
            lambda v, m, a, b, t=_sess_tz: hive_reflect2(v, m, a, b, tz=t),
            T.StringType(),
        ),
    )
    spark.udf.register(
        "reflect2",
        _audf(
            lambda v, m, t=_sess_tz: hive_reflect2(v, m, tz=t),
            T.StringType(),
        ),
    )
    spark.udf.register("hive_tz_norm", _audf(hive_tz_norm, T.StringType()))
    spark.udf.register(
        "qtest_get_java_boolean",
        # GenericUDFTestGetJavaBoolean: 'true'/'false' parse, anything
        # else NULL (create_func1.q's 'abc' → NULL)
        lambda s: (
            True
            if s is not None and s.lower() == "true"
            else False
            if s is not None and s.lower() == "false"
            else None
        ),
        T.BooleanType(),
    )
