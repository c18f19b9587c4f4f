package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Column expression wrapper with the pandas Series operator surface
  * (reference `_collection.py:4077` Series; elemwise family
  * `_expr.py:2614-2893`). A Series is a lazy expression — it only
  * evaluates inside a [[Frame]] operation — so composing them builds
  * exactly the Catalyst column tree the operator library produces.
  */
final class Series(val col: Column) {

  // -- arithmetic (reference Add/Sub/Mul/Div/FloorDiv/Pow/Mod, _expr.py:2700+)
  def +(o: Series): Series = Series(col + o.col)
  def +(o: Any): Series = Series(col + lit(o))
  def -(o: Series): Series = Series(col - o.col)
  def -(o: Any): Series = Series(col - lit(o))
  def *(o: Series): Series = Series(col * o.col)
  def *(o: Any): Series = Series(col * lit(o))
  def /(o: Series): Series = Series(col / o.col)
  def /(o: Any): Series = Series(col / lit(o))
  def %(o: Any): Series = Series(col % lit(o))
  def **(o: Double): Series = Series(pow(col, o))
  def floordiv(o: Any): Series = Series(F.floor(col / lit(o)).cast("long"))
  def unary_- : Series = Series(-col)

  // -- comparisons / boolean algebra (reference LT..NE, And/Or/Invert)
  def <(o: Any): Series = Series(col < lit(o))
  def <=(o: Any): Series = Series(col <= lit(o))
  def >(o: Any): Series = Series(col > lit(o))
  def >=(o: Any): Series = Series(col >= lit(o))
  def ===(o: Any): Series = Series(col === lit(o))
  def =!=(o: Any): Series = Series(col =!= lit(o))
  def <(o: Series): Series = Series(col < o.col)
  def >(o: Series): Series = Series(col > o.col)
  def ===(o: Series): Series = Series(col === o.col)
  def &&(o: Series): Series = Series(col && o.col)
  def ||(o: Series): Series = Series(col || o.col)
  def unary_! : Series = Series(!col)

  // -- predicates / conversions (reference Isin/Between/IsNa/NotNull/AsType)
  def isin(vs: Any*): Series = Series(col.isin(vs: _*))
  def between(lo: Any, hi: Any): Series = Series(col.between(lo, hi))
  def isna: Series = Series(col.isNull)
  def notna: Series = Series(col.isNotNull)
  def astype(t: String): Series = Series(col.cast(t))
  def fillna(v: Any): Series = Series(coalesce(col, lit(v)))

  // -- scalar math (reference Clip/Where/Mask/Round/Abs/Sqrt, ufuncs)
  def clip(lo: Double, hi: Double): Series = Series(least(greatest(col, lit(lo)), lit(hi)))
  def where(cond: Series, other: Any = null): Series =
    Series(when(cond.col, col).otherwise(lit(other)))
  def mask(cond: Series, other: Any = null): Series =
    Series(when(cond.col, lit(other)).otherwise(col))
  def abs: Series = Series(org.apache.spark.sql.functions.abs(col))
  def sqrt: Series = Series(org.apache.spark.sql.functions.sqrt(col))
  def round(scale: Int = 0): Series = Series(org.apache.spark.sql.functions.round(col, scale))
  def floor: Series = Series(org.apache.spark.sql.functions.floor(col))
  def ceil: Series = Series(org.apache.spark.sql.functions.ceil(col))
  def exp: Series = Series(org.apache.spark.sql.functions.exp(col))
  def log: Series = Series(org.apache.spark.sql.functions.log(col))

  def as(name: String): Series = Series(col.as(name))

  /** String accessor (reference `_str_accessor.py:10-176`). */
  def str: StrOps = new StrOps(col)
  /** Datetime accessor (reference `_datetime.py:4-72`). */
  def dt: DtOps = new DtOps(col)
}

object Series {
  def apply(c: Column): Series = new Series(c)
  def apply(name: String): Series = new Series(col(name))
  def lit_(v: Any): Series = new Series(lit(v))
}

/** `.str` accessor: the reference's 55-method pandas string surface
  * re-expressed as codegen'd Spark column functions (no UDFs).
  * Reference `_str_accessor.py:10-176`. */
final class StrOps(private val c: Column) {
  def upper: Series = Series(org.apache.spark.sql.functions.upper(c))
  def lower: Series = Series(org.apache.spark.sql.functions.lower(c))
  def len: Series = Series(length(c))
  def slice(start: Int, stop: Int): Series = Series(substring(c, start + 1, stop - start))
  def get(i: Int): Series = Series(substring(c, i + 1, 1))
  def strip: Series = Series(trim(c))
  def lstrip: Series = Series(ltrim(c))
  def rstrip: Series = Series(rtrim(c))
  def pad(width: Int, side: String = "left", fillchar: String = " "): Series = side match {
    case "left"  => Series(lpad(c, width, fillchar))
    case "right" => Series(rpad(c, width, fillchar))
    case "both"  => Series(rpad(
      lpad(c, length(c) + ((lit(width) - length(c)) / 2).cast("int"), lit(fillchar)),
      width, fillchar))
  }
  def ljust(width: Int, fillchar: String = " "): Series = Series(rpad(c, width, fillchar))
  def rjust(width: Int, fillchar: String = " "): Series = Series(lpad(c, width, fillchar))
  def center(width: Int, fillchar: String = " "): Series = pad(width, "both", fillchar)
  def zfill(width: Int): Series = Series(lpad(c, width, "0"))
  def contains(sub: String): Series = Series(c.contains(sub))
  def startswith(p: String): Series = Series(c.startsWith(p))
  def endswith(p: String): Series = Series(c.endsWith(p))
  def matchRe(re: String): Series = Series(c.rlike("^(?:" + re + ")"))
  def fullmatch(re: String): Series = Series(c.rlike("^(?:" + re + ")$"))
  def replace(pat: String, rep: String): Series = Series(regexp_replace(c, pat, rep))
  def extract(re: String, group: Int = 1): Series = Series(regexp_extract(c, re, group))
  /** All matches of `re`, as an array column (reference extractall /
    * findall — the per-match rows come from Frame.explode over this). */
  def findall(re: String): Series = Series(regexp_extract_all(c, org.apache.spark.sql.functions.lit(re), org.apache.spark.sql.functions.lit(0)))
  def count(re: String): Series = Series(regexp_count(c, org.apache.spark.sql.functions.lit(re)))
  /** Every match of `re` with its capture groups, as an array of
    * structs (group_1..group_n) — the reference's extractall rows come
    * from Frame.explode over this (reference `_str_accessor.py`
    * extractall). */
  def extractall(re: String, groups: Int = 1): Series =
    Series(transform(
      regexp_extract_all(c, org.apache.spark.sql.functions.lit(re), org.apache.spark.sql.functions.lit(0)),
      m => struct((1 to groups).map(g => regexp_extract(m, re, g).as(s"group_$g")): _*)))
  def find(sub: String): Series = Series(instr(c, sub) - 1)
  def split(sep: String): Series = Series(org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(sep)))
  def splitGet(sep: String, i: Int): Series =
    Series(element_at(org.apache.spark.sql.functions.split(c, java.util.regex.Pattern.quote(sep)), i + 1))
  /** (head, sep, tail) around the FIRST separator, pandas partition
    * semantics; struct-typed (Frame.assign + select fields). */
  def partition(sep: String): Series = {
    val idx = instr(c, sep)
    Series(struct(
      when(idx > 0, substring_index(c, sep, 1)).otherwise(c).as("head"),
      when(idx > 0, org.apache.spark.sql.functions.lit(sep))
        .otherwise(org.apache.spark.sql.functions.lit("")).as("sep"),
      when(idx > 0, c.substr(idx + sep.length, length(c)))
        .otherwise(org.apache.spark.sql.functions.lit("")).as("tail")))
  }
  def repeat(n: Int): Series = Series(org.apache.spark.sql.functions.repeat(c, n))
  def reverse: Series = Series(org.apache.spark.sql.functions.reverse(c))
  def title: Series = Series(initcap(c))
  def capitalize: Series = Series(concat(org.apache.spark.sql.functions.upper(substring(c, 1, 1)), org.apache.spark.sql.functions.lower(substring(c, 2, Int.MaxValue))))
  def translate(from: String, to: String): Series = Series(org.apache.spark.sql.functions.translate(c, from, to))
  def removeprefix(p: String): Series =
    Series(when(c.startsWith(p), substring(c, p.length + 1, Int.MaxValue)).otherwise(c))
  def removesuffix(s: String): Series =
    Series(when(c.endsWith(s), c.substr(lit(1), length(c) - s.length)).otherwise(c))
  def isalpha: Series = Series(c.rlike("^[A-Za-z]+$"))
  def isdigit: Series = Series(c.rlike("^[0-9]+$"))
  def isalnum: Series = Series(c.rlike("^[A-Za-z0-9]+$"))
  def isspace: Series = Series(c.rlike("^\\s+$"))
  def isupper: Series = Series(c === org.apache.spark.sql.functions.upper(c) && c.rlike("[A-Za-z]"))
  def islower: Series = Series(c === org.apache.spark.sql.functions.lower(c) && c.rlike("[A-Za-z]"))
  /** Wrap long text at `width` chars (pandas str.wrap, greedy on word
    * boundaries is approximated by hard wrapping — documented). */
  def wrap(width: Int): Series =
    Series(array_join(regexp_extract_all(c, org.apache.spark.sql.functions.lit(s".{1,$width}"), org.apache.spark.sql.functions.lit(0)), "\n"))
  def cat(other: Column, sep: String = ""): Series = Series(concat_ws(sep, c, other))
  /** Unicode normalization (pandas str.normalize; NFC/NFD/NFKC/NFKD) —
    * a native codegen'd expression, see functions.UnicodeNormalize. */
  def normalize(form: String = "NFC"): Series =
    Series(graft.functions.UnicodeNormalize(c, form))
  /** Aggressive case-insensitive fold (pandas str.casefold). Upper-then-
    * lower resolves the one-to-many folds (ß→SS→ss) that plain lower()
    * leaves alone; locale-independent on both engines. */
  def casefold: Series =
    Series(org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.upper(c)))
}

/** `.dt` accessor (reference `_datetime.py:4-72` + the 29 datetime
  * properties on the collection). */
final class DtOps(private val c: Column) {
  def year: Series = Series(org.apache.spark.sql.functions.year(c))
  def month: Series = Series(org.apache.spark.sql.functions.month(c))
  def day: Series = Series(dayofmonth(c))
  def hour: Series = Series(org.apache.spark.sql.functions.hour(c))
  def minute: Series = Series(org.apache.spark.sql.functions.minute(c))
  def second: Series = Series(org.apache.spark.sql.functions.second(c))
  def microsecond: Series = Series((unix_micros(c) % 1000000L).cast("int"))
  def dayofweek: Series = Series(F.weekday(c))
  def weekday: Series = Series(org.apache.spark.sql.functions.weekday(c))
  def isoWeekday: Series = Series(org.apache.spark.sql.functions.weekday(c) + 1)
  def dayofyear: Series = Series(org.apache.spark.sql.functions.dayofyear(c))
  def quarter: Series = Series(org.apache.spark.sql.functions.quarter(c))
  def week: Series = Series(weekofyear(c))
  def date: Series = Series(to_date(c))
  def normalize: Series = Series(date_trunc("day", c))
  def floor(freq: String): Series = Series(date_trunc(freq, c))
  def truncate(freq: String): Series = Series(date_trunc(freq, c))
  def strftime(fmt: String): Series = Series(date_format(c, fmt))
  def dayName: Series = Series(date_format(c, "EEEE"))
  def monthName: Series = Series(date_format(c, "MMMM"))
  def daysInMonth: Series = Series(dayofmonth(last_day(c)))
  def isMonthStart: Series = Series(dayofmonth(c) === 1)
  def isMonthEnd: Series = Series(to_date(c) === last_day(c))
  def isQuarterStart: Series =
    Series(dayofmonth(c) === 1 && (org.apache.spark.sql.functions.month(c) % 3) === 1)
  def isYearStart: Series = Series(org.apache.spark.sql.functions.dayofyear(c) === 1)
  def isLeapYear: Series = {
    val y = org.apache.spark.sql.functions.year(c)
    Series((y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0)
  }
  /** Reinterpret a naive timestamp as wall-clock in `tz`, yielding the
    * corresponding UTC instant (pandas tz_localize). */
  def tzLocalize(tz: String): Series = Series(to_utc_timestamp(c, tz))
  /** Shift a UTC instant to wall-clock time in `tz` (pandas tz_convert
    * — Spark timestamps render in session TZ, so the wall-clock shift
    * is the portable representation). */
  def tzConvert(tz: String): Series = Series(from_utc_timestamp(c, tz))
  /** Period label at `freq` (pandas to_period, represented as the
    * period's start timestamp). */
  def toPeriod(freq: String): Series = Series(date_trunc(freq, c))
  /** Seconds (with fractional part) since the epoch — composes with
    * subtraction for pandas' timedelta total_seconds. */
  def epochSeconds: Series = Series(unix_micros(c).cast("double") / 1e6)
  /** Fractional seconds since local midnight. Subtracts INTEGER
    * microseconds before the one division: `epochSeconds -
    * normalize.epochSeconds` differences two ~1e9-magnitude doubles
    * and the cancellation leaves ~1e-8 s of noise (a real bug this
    * accessor replaced — caught by the cross-scale oracle diff). */
  def secondsIntoDay: Series =
    Series((unix_micros(c) - unix_micros(date_trunc("day", c))).cast("double") / 1e6)
}

/** Module conversions (reference to_timedelta `_collection.py:6110`). */
object DtOps {
  /** Numeric seconds → DayTimeIntervalType timedelta (pandas
    * to_timedelta(unit="s")); composes with timestamp +/-. */
  def toTimedeltaSeconds(seconds: Series): Series =
    Series(make_dt_interval(lit(0), lit(0), lit(0), seconds.col))
}
