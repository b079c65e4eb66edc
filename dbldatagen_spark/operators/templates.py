"""v0-style template text generation (``template="ddd-ddd-dddd"``).

Token language (compatible with the reference's published template spec,
``/root/reference/dbldatagen/text_generators.py:413-995``; implementation
original, fully vectorized in numpy):

====== =====================================================
token  meaning (default mode, ``escape_special_chars=False``)
====== =====================================================
``x``  random lowercase hex digit
``X``  random uppercase hex digit
``d``  random digit 0-9
``D``  random digit 1-9
``a``  random lowercase letter
``A``  random uppercase letter
``k``  random lowercase alphanumeric
``K``  random uppercase alphanumeric
``\\n`` random number 0..255
``\\N`` random number 0..65535
``\\w`` random lorem word (lowercase)
``\\W`` random capitalized lorem word
``\\v`` substitute the base value verbatim
``\\v0..\\v9`` index into an array-typed base value
``\\V`` base value as string
``|``  alternation — pick one alternative per row
====== =====================================================

With ``escape_special_chars=True`` the polarity flips: plain letters are
literal and only ``\\d`` / ``\\a`` / ... generate.

Determinism: the UDF receives the per-row 64-bit cell seed (computed
JVM-side as ``xxhash64(column_seed, row_id)``); each template slot *j*
derives its draw as ``splitmix64(seed ^ f(j)) % base`` — vectorized uint64
numpy, partition-independent, no RNG state. Arrow-batched pandas UDF keeps
the Python boundary to one crossing per ~10k rows.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_LOWER = np.array(list("abcdefghijklmnopqrstuvwxyz"))
_UPPER = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
_DIGITS = np.array(list("0123456789"))
_NZDIGITS = np.array(list("123456789"))
_HEX_L = np.array(list("0123456789abcdef"))
_HEX_U = np.array(list("0123456789ABCDEF"))
_ALNUM_L = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
_ALNUM_U = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"))

# classic lorem-ipsum vocabulary (public text), used by \w / \W and ILText
LOREM_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "eu fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum perspiciatis "
    "unde omnis iste natus error voluptatem accusantium doloremque laudantium "
    "totam rem aperiam eaque ipsa quae ab illo inventore veritatis quasi "
    "architecto beatae vitae dicta explicabo nemo ipsam quia voluptas "
    "aspernatur aut odit fugit consequuntur magni dolores eos ratione "
    "sequi nesciunt neque porro quisquam dolorem adipisci numquam eius modi "
    "tempora incidunt magnam quaerat etiam minus solutum nobis eligendi "
    "optio cumque nihil impedit quo facere possimus assumenda repellendus"
).split()
_WORDS = np.array(LOREM_WORDS)
_WORDS_CAP = np.array([w.capitalize() for w in LOREM_WORDS])

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    with np.errstate(over="ignore"):
        x = (x + _C1) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * _C2) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * _C3) & _MASK64
        return x ^ (x >> np.uint64(31))


# slot kinds
_K_LITERAL = 0
_K_CHARSET = 1
_K_NUMBER = 2
_K_WORD = 3
_K_VALUE = 4  # base value (optionally indexed)

_CHARSETS = {
    "x": _HEX_L, "X": _HEX_U, "d": _DIGITS, "D": _NZDIGITS,
    "a": _LOWER, "A": _UPPER, "k": _ALNUM_L, "K": _ALNUM_U,
}


class CompiledTemplate:
    """One alternation-free template compiled to a slot list."""

    __slots__ = ("slots",)

    def __init__(self, slots: List[Tuple[int, object]]):
        self.slots = slots

    def expand(self, seeds: np.ndarray, values: Optional[pd.Series]) -> np.ndarray:
        n = len(seeds)
        parts: List[np.ndarray] = []
        for j, (kind, arg) in enumerate(self.slots):
            salt = np.uint64(((j + 1) * 0x632BE59BD9B4E019) & 0xFFFFFFFFFFFFFFFF)
            if kind == _K_LITERAL:
                parts.append(np.full(n, arg, dtype=object))
            elif kind == _K_CHARSET:
                charset = arg
                draws = _mix(seeds ^ salt) % np.uint64(len(charset))
                parts.append(charset[draws.astype(np.int64)].astype(object))
            elif kind == _K_NUMBER:
                bound = np.uint64(arg)
                draws = _mix(seeds ^ salt) % bound
                parts.append(draws.astype(np.int64).astype(str).astype(object))
            elif kind == _K_WORD:
                words = arg
                draws = _mix(seeds ^ salt) % np.uint64(len(words))
                parts.append(words[draws.astype(np.int64)].astype(object))
            elif kind == _K_VALUE:
                if values is None:
                    parts.append(np.full(n, "", dtype=object))
                elif arg is None:
                    parts.append(values.astype(str).to_numpy(dtype=object))
                else:
                    idx = arg

                    def pick(v, i=idx):
                        try:
                            return str(v[i])
                        except Exception:
                            return ""

                    parts.append(values.map(pick).to_numpy(dtype=object))
        if not parts:
            return np.full(n, "", dtype=object)
        out = parts[0].copy()
        for p in parts[1:]:
            out = np.char.add(out.astype(str), p.astype(str)).astype(object)
        return out


def compile_template(template: str, escape_special_chars: bool = False
                     ) -> List[CompiledTemplate]:
    """Split on unescaped ``|`` then compile each alternative."""
    alternatives: List[str] = []
    cur = []
    i = 0
    while i < len(template):
        ch = template[i]
        if ch == "\\" and i + 1 < len(template):
            cur.append(ch)
            cur.append(template[i + 1])
            i += 2
            continue
        if ch == "|":
            alternatives.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    alternatives.append("".join(cur))
    return [_compile_one(a, escape_special_chars) for a in alternatives]


def _compile_one(template: str, escape_special_chars: bool) -> CompiledTemplate:
    slots: List[Tuple[int, object]] = []
    literal: List[str] = []

    def flush() -> None:
        if literal:
            slots.append((_K_LITERAL, "".join(literal)))
            literal.clear()

    i = 0
    while i < len(template):
        ch = template[i]
        if ch == "\\" and i + 1 < len(template):
            nxt = template[i + 1]
            i += 2
            if nxt == "n":
                flush(); slots.append((_K_NUMBER, 256))
            elif nxt == "N":
                flush(); slots.append((_K_NUMBER, 65536))
            elif nxt == "w":
                flush(); slots.append((_K_WORD, _WORDS))
            elif nxt == "W":
                flush(); slots.append((_K_WORD, _WORDS_CAP))
            elif nxt == "v":
                if i < len(template) and template[i].isdigit():
                    flush(); slots.append((_K_VALUE, int(template[i])))
                    i += 1
                else:
                    flush(); slots.append((_K_VALUE, None))
            elif nxt == "V":
                flush(); slots.append((_K_VALUE, None))
            elif escape_special_chars and nxt in _CHARSETS:
                flush(); slots.append((_K_CHARSET, _CHARSETS[nxt]))
            else:
                literal.append(nxt)  # escaped literal (\\, \-, or plain char)
            continue
        if not escape_special_chars and ch in _CHARSETS:
            flush()
            slots.append((_K_CHARSET, _CHARSETS[ch]))
        else:
            literal.append(ch)
        i += 1
    flush()
    return CompiledTemplate(slots)


_ALT_SALT = np.uint64(0xD1B54A32D192ED03)


def expand_templates(
    compiled: List[CompiledTemplate],
    seeds: np.ndarray,
    values: Optional[pd.Series],
) -> pd.Series:
    """Vectorized expansion: pick an alternative per row, expand each
    alternative over its row subset."""
    useeds = seeds.astype(np.uint64)
    n = len(useeds)
    if len(compiled) == 1:
        return pd.Series(compiled[0].expand(useeds, values))
    choice = (_mix(useeds ^ _ALT_SALT) % np.uint64(len(compiled))).astype(np.int64)
    out = np.empty(n, dtype=object)
    for k, tmpl in enumerate(compiled):
        mask = choice == k
        if not mask.any():
            continue
        sub_values = values[mask].reset_index(drop=True) if values is not None else None
        out[mask] = tmpl.expand(useeds[mask], sub_values)
    return pd.Series(out)


def template_udf_expr(
    template: str,
    seed_col: Column,
    base_col: Optional[Column] = None,
    escape_special_chars: bool = False,
) -> Column:
    """Pandas-UDF column for a v0 template. ``base_col`` feeds ``\\v``."""
    compiled = compile_template(template, escape_special_chars)
    needs_value = any(
        kind == _K_VALUE for t in compiled for kind, _ in t.slots
    )

    if needs_value and base_col is not None:
        def _expand2(seeds: pd.Series, vals: pd.Series) -> pd.Series:
            return expand_templates(compiled, seeds.to_numpy(np.int64), vals)

        udf = F.pandas_udf(_expand2, StringType())
        return udf(seed_col.cast("long"), base_col)

    def _expand(seeds: pd.Series) -> pd.Series:
        return expand_templates(compiled, seeds.to_numpy(np.int64), None)

    udf = F.pandas_udf(_expand, StringType())
    return udf(seed_col.cast("long"))


_SLOT_SALT_C = 0x632BE59BD9B4E019
_ALT_SALT_INT = 0xD1B54A32D192ED03


def _to_signed64(x: int) -> int:
    x &= 0xFFFFFFFFFFFFFFFF
    return x - (1 << 64) if x >= (1 << 63) else x


def template_expr(
    template: str,
    seed_col: Column,
    base_col: Optional[Column] = None,
    escape_special_chars: bool = False,
) -> Column:
    """Pure-Catalyst fast path for the v0 template language: the whole
    template compiles to ``substring``/``element_at``/``concat`` over
    per-slot ``xxhash64`` draws — no Python in the plan, full whole-stage
    codegen, measured ~6x the pandas-UDF path at 10M rows.

    Supports every template token (charsets, ``\\n``/``\\N`` numbers,
    ``\\w``/``\\W`` words, ``\\v``/``\\v0-\\v9`` base values, ``|``
    alternation). Draw values come from ``xxhash64`` rather than the UDF
    path's splitmix64, so the two paths emit *different* (equally
    deterministic, partition-independent) streams for the same seed —
    choose one per column and stick with it across rebuilds.
    """
    compiled = compile_template(template, escape_special_chars)

    def slot_expr(j: int, kind: int, arg) -> Column:
        salt = _to_signed64((j + 1) * _SLOT_SALT_C)
        if kind == _K_LITERAL:
            return F.lit(arg)
        if kind == _K_CHARSET:
            charset = "".join(arg.tolist())
            draw = F.pmod(F.xxhash64(F.lit(salt), seed_col), F.lit(len(charset)))
            return F.substring(
                F.lit(charset), (draw + 1).cast("int"), F.lit(1)
            )
        if kind == _K_NUMBER:
            draw = F.pmod(F.xxhash64(F.lit(salt), seed_col), F.lit(int(arg)))
            return draw.cast("string")
        if kind == _K_WORD:
            words = arg
            draw = F.pmod(F.xxhash64(F.lit(salt), seed_col), F.lit(len(words)))
            return F.element_at(
                F.array(*[F.lit(w) for w in words.tolist()]),
                (draw + 1).cast("int"),
            )
        if kind == _K_VALUE:
            # degrade exactly like the UDF path (pandas astype(str) /
            # str(v[i])-with-fallback): a null base renders as "None", an
            # out-of-range \vN index as "" — and never nulls the whole
            # concat or throws under ANSI mode.
            if base_col is None:
                return F.lit("")
            if arg is None:
                return F.coalesce(base_col.cast("string"), F.lit("None"))
            idx = int(arg) + 1
            elem = F.try_element_at(base_col, F.lit(idx))
            return F.when(
                F.size(base_col) >= idx,
                F.coalesce(elem.cast("string"), F.lit("None")),
            ).otherwise(F.lit(""))
        raise ValueError(f"unknown slot kind {kind}")

    def alt_expr(tmpl: CompiledTemplate) -> Column:
        if not tmpl.slots:
            return F.lit("")
        return F.concat(
            *[slot_expr(j, kind, arg) for j, (kind, arg) in enumerate(tmpl.slots)]
        )

    if len(compiled) == 1:
        return alt_expr(compiled[0])
    choice = F.pmod(
        F.xxhash64(F.lit(_to_signed64(_ALT_SALT_INT)), seed_col),
        F.lit(len(compiled)),
    )
    out = alt_expr(compiled[0])
    for k in range(len(compiled) - 1, 0, -1):
        out = F.when(choice == k, alt_expr(compiled[k])).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# ILText — ipsum-lorem paragraphs (reference text_generators.py:996-1257)
# ---------------------------------------------------------------------------


def iltext_udf_expr(
    seed_col: Column,
    paragraphs: Tuple[int, int] = (1, 1),
    sentences: Tuple[int, int] = (2, 4),
    words: Tuple[int, int] = (4, 8),
) -> Column:
    """Ipsum-lorem text: per-row deterministic paragraph/sentence/word counts
    drawn uniformly from the given (min,max) ranges, words from the shared
    lorem vocabulary. Vectorized per sentence-slot batch."""
    p_lo, p_hi = paragraphs
    s_lo, s_hi = sentences
    w_lo, w_hi = words

    def _gen(seeds: pd.Series) -> pd.Series:
        return pd.Series(expand_iltext(
            seeds.to_numpy(np.int64).astype(np.uint64),
            (p_lo, p_hi), (s_lo, s_hi), (w_lo, w_hi),
        ))

    udf = F.pandas_udf(_gen, StringType())
    return udf(seed_col.cast("long"))


def expand_iltext(useeds, paragraphs, sentences, words):
    """Driver/executor-shared ILText expansion over uint64 seeds — the
    deterministic core behind both the pandas-UDF path and the standalone
    ``ILText.generateText`` API."""
    p_lo, p_hi = paragraphs
    s_lo, s_hi = sentences
    w_lo, w_hi = words
    out = []
    nw = len(_WORDS)
    for seed in useeds:
        s = np.uint64(seed)
        n_par = int(_mix(np.array([s ^ np.uint64(1)]))[0] % np.uint64(p_hi - p_lo + 1)) + p_lo
        pieces = []
        slot = 2
        for _p in range(n_par):
            n_sent = int(_mix(np.array([s ^ np.uint64(slot)]))[0] % np.uint64(s_hi - s_lo + 1)) + s_lo
            slot += 1
            sent_parts = []
            for _s in range(n_sent):
                n_words = int(_mix(np.array([s ^ np.uint64(slot)]))[0] % np.uint64(w_hi - w_lo + 1)) + w_lo
                slot += 1
                idx = (
                    _mix(s ^ (np.arange(slot, slot + n_words, dtype=np.uint64)
                              * np.uint64(0x9E3779B97F4A7C15)))
                    % np.uint64(nw)
                ).astype(np.int64)
                slot += n_words
                ws = _WORDS[idx]
                sent = " ".join(ws)
                sent_parts.append(sent[0].upper() + sent[1:] + ".")
            pieces.append(" ".join(sent_parts))
        out.append("\n\n".join(pieces))
    return out


# ---------------------------------------------------------------------------
# PyfuncText — plugin text generators (reference text_generator_plugins.py)
# ---------------------------------------------------------------------------


class TextGenerator:
    """Base for text generator objects accepted by
    ``withColumn(..., text=...)`` (reference ``text_generators.py:248-410``).
    Subclasses implement ``make_expr(seed_col, base_col)`` (the engine
    integration — inside a build, seeding flows from the engine's
    partition-independent column seed) and ``pandasGenerateText`` (the
    standalone vectorized API)."""

    def make_expr(self, seed_col: Column, base_col: Optional[Column] = None) -> Column:
        raise NotImplementedError

    def pandasGenerateText(self, v: "pd.Series") -> "pd.Series":
        raise NotImplementedError(
            "Subclasses should implement unique versions of `pandasGenerateText`"
        )

    def classicGenerateText(self, v) -> str:
        """Row-at-a-time form: expand one base value (reference
        ``text_generators.py:611-621``)."""
        return str(self.pandasGenerateText(pd.Series([v])).iloc[0])

    @property
    def randomSeed(self) -> int:
        """Seed installed via withRandomSeed (42 when unset). Note that
        inside a build, expansion is driven by the engine's per-cell seed
        stream; this value affects only standalone generateText use."""
        return getattr(self, "_randomSeed", 42)

    def withRandomSeed(self, seed: int) -> "TextGenerator":
        self._randomSeed = seed
        return self

    def getNPRandomGenerator(self, forceNewInstance: bool = False):
        """NumPy Generator seeded from randomSeed (reference
        ``text_generators.py:294-316``); cached unless forceNewInstance."""
        seed = self.randomSeed
        if not isinstance(seed, (int, np.integer)) and seed is not None:
            raise ValueError(
                f"`random_seed` must be int or int-like not {type(seed)}"
            )
        rng = getattr(self, "_rngInstance", None)
        if rng is not None and not forceNewInstance:
            return rng
        if seed is not None and seed not in (-1, -1.0):
            rng = np.random.default_rng(seed=seed)
        else:
            rng = np.random.default_rng()
        if not forceNewInstance:
            self._rngInstance = rng
        return rng

    @staticmethod
    def compactNumpyTypeForValues(listValues) -> np.dtype:
        """Smallest unsigned numpy dtype covering the values (reference
        ``text_generators.py:319-339``)."""
        import math

        if isinstance(listValues, list):
            max_value = np.max(np.array(listValues).flatten())
        else:
            max_value = np.max(listValues.flatten()) + 1
        bits_required = math.ceil(math.log2(max_value))
        if bits_required <= 8:
            return np.dtype("B")
        nbytes = math.ceil(bits_required / 8.0)
        pow2 = 1
        while pow2 < nbytes:
            pow2 *= 2
        return np.dtype(f"u{pow2}")

    @staticmethod
    def getAsTupleOrElse(v, defaultValue, valueName: str = "value"):
        """Bounds spec -> (min, max) pair with the reference's validation
        (``text_generators.py:342-400``)."""

        def pair(value, name):
            if isinstance(value, bool):
                raise ValueError(
                    f"Parameter '{name}' must be an integer, a 2 element "
                    f"tuple or list, or None, but a 'bool' was supplied"
                )
            if isinstance(value, int):
                return value, value
            if not isinstance(value, (tuple, list)):
                raise ValueError(
                    f"Parameter '{name}' must be an integer, a 2 element "
                    f"tuple or list, or None, but a "
                    f"'{type(value).__name__}' was supplied"
                )
            if len(value) != 2:
                raise ValueError(
                    f"Parameter '{name}' must have exactly 2 elements, "
                    f"but {len(value)} elements were supplied"
                )
            if not all(isinstance(e, int) and not isinstance(e, bool)
                       for e in value):
                raise ValueError(
                    f"Parameter '{name}' must only contain integer values"
                )
            lo, hi = value[0], value[1]
            if lo > hi:
                raise ValueError(
                    f"Parameter '{name}' minimum ({lo}) must not exceed "
                    f"maximum ({hi})"
                )
            return lo, hi

        if not v:
            return pair(defaultValue, "defaultValue")
        return pair(v, valueName)


class ILText(TextGenerator):
    """Ipsum-lorem text generator object for ``withColumn(..., text=ILText(...))``.

    ``paragraphs``/``sentences``/``words`` accept an int or a (min, max)
    tuple (reference ``text_generators.py:996-1257`` semantics).
    """

    def __init__(self, paragraphs=1, sentences=2, words=6):
        def _pair(v):
            if isinstance(v, (tuple, list)):
                lo, hi = int(v[0]), int(v[1])
            else:
                lo = hi = int(v)
            if lo < 1 or hi < lo:
                raise ValueError(f"invalid ILText range {v!r}")
            return (lo, hi)

        self.paragraphs = _pair(paragraphs)
        self.sentences = _pair(sentences)
        self.words = _pair(words)

    def make_expr(self, seed_col: Column, base_col: Optional[Column] = None) -> Column:
        return iltext_udf_expr(
            seed_col, self.paragraphs, self.sentences, self.words
        )

    def generateText(self, baseValues, rowCount: int = 1):
        """Standalone expansion (reference ``text_generators.py:1046-1057``):
        one ipsum-lorem text per base value; seeds derive from randomSeed
        and the value's position, so output is deterministic for a given
        withRandomSeed setting."""
        seeds = (np.arange(rowCount, dtype=np.uint64)
                 ^ np.uint64(self.randomSeed & 0xFFFFFFFFFFFFFFFF))
        return expand_iltext(seeds, self.paragraphs, self.sentences, self.words)

    def pandasGenerateText(self, v: "pd.Series") -> "pd.Series":
        rows = v.to_numpy()
        return pd.Series(self.generateText(rows, rows.size))


class PyfuncText(TextGenerator):
    """User-plugin text generator mirroring the reference plugin model
    (``text_generator_plugins.py:45-178``): ``fn(context, base_value)``
    with an optional ``init(context)`` run once per executor (or per
    Arrow batch with ``initPerBatch``). When ``rootProperty`` is set the
    function is instead called as ``fn(context.<rootProperty>)`` and the
    base value is ignored — the calling convention Faker-style plugins
    use."""

    def __init__(self, fn, init=None, name: str = "pyfuncText",
                 rootProperty: Optional[str] = None, initPerBatch: bool = False):
        if not callable(fn):
            raise ValueError(
                "Function must be provided with signature fn(context, oldValue)"
            )
        if init is not None and not callable(init):
            raise ValueError("init must be callable if provided")
        self.fn = fn
        self.init = init
        self.name = name
        self.root_property = rootProperty
        self.init_per_batch = bool(initPerBatch)

    def __str__(self) -> str:
        return f"{self.name}({self.fn!r}, init={self.init})"

    def pandasGenerateText(self, v: "pd.Series") -> "pd.Series":
        """Driver-side plugin application over a Series of base values
        (reference ``text_generator_plugins.py:160-178`` semantics: one
        shared context, rootProperty calling convention honored)."""

        class _Ctx:
            pass

        ctx = _Ctx()
        if self.init is not None:
            self.init(ctx)
        if self.root_property is not None:
            root = getattr(ctx, self.root_property)
            return v.map(lambda _v: str(self.fn(root)))
        return v.map(lambda x: str(self.fn(ctx, x)))

    def make_expr(self, seed_col: Column, base_col: Optional[Column] = None) -> Column:
        fn, init = self.fn, self.init
        root_property, per_batch = self.root_property, self.init_per_batch

        class _Ctx:
            pass

        holder = {}

        def _context():
            if per_batch or "ctx" not in holder:
                ctx = _Ctx()
                if init is not None:
                    init(ctx)
                holder["ctx"] = ctx
            return holder["ctx"]

        def _apply(vals: pd.Series) -> pd.Series:
            ctx = _context()
            if root_property is not None:
                root = getattr(ctx, root_property)
                return vals.map(lambda _v: str(fn(root)))
            return vals.map(lambda v: str(fn(ctx, v)))

        udf = F.pandas_udf(_apply, StringType())
        src = base_col if base_col is not None else seed_col.cast("long")
        return udf(src)


class PyfuncTextFactory:
    """Fluent builder for :class:`PyfuncText` objects (reference
    ``text_generator_plugins.py:181-313``)::

        MyText = (PyfuncTextFactory(name="MyText")
                  .withInit(init_fn)
                  .withRootProperty("gen"))
        ...withColumn("x", text=MyText("sentence", ext_word_list=words))

    Calling the factory with a *string* resolves a method of that name on
    the root property (or a plain property with ``isProperty=True``);
    calling with a callable passes it through.
    """

    def __init__(self, name: Optional[str] = None):
        self._name = name or "PyfuncText"
        self._init_fn = None
        self._root_property = None
        self._init_per_batch = False

    def withInit(self, fn) -> "PyfuncTextFactory":
        self._init_fn = fn
        return self

    def withInitPerBatch(self, fn) -> "PyfuncTextFactory":
        self._init_per_batch = True
        return self.withInit(fn)

    def withRootProperty(self, prop: str) -> "PyfuncTextFactory":
        self._root_property = prop
        return self

    def __call__(self, evalFn, *args, isProperty: bool = False, **kwargs) -> PyfuncText:
        if evalFn is None or not (isinstance(evalFn, str) or callable(evalFn)):
            raise ValueError("Function or method name must be provided")
        if isinstance(evalFn, str):
            if not self._root_property:
                raise ValueError(
                    "String-named functions require a root property"
                )
            if (args or kwargs) and isProperty:
                raise ValueError(
                    "'isProperty' cannot be combined with arguments"
                )
            method_name = evalFn

            def evalFn(root, _n=method_name, _a=args, _k=kwargs, _p=isProperty):
                member = getattr(root, _n)
                return member if _p else member(*_a, **_k)

        return PyfuncText(
            evalFn,
            init=self._init_fn,
            name=self._name,
            rootProperty=self._root_property,
            initPerBatch=self._init_per_batch,
        )


class _BuiltinFakerShim:
    """Deterministic stand-in for a ``Faker`` instance when the library is
    unavailable: any method resolves to a generator over the builtin fake
    value table, advancing an LCG per call."""

    def __init__(self, seed: int = 0x5EED):
        self._state = seed & ((1 << 63) - 1)

    def __getattr__(self, method):
        if method.startswith("_"):
            raise AttributeError(method)
        from dbldatagen_spark.operators.text import _builtin_fake

        def _gen(*_a, **_k):
            self._state = (self._state * 6364136223846793005 + 1442695040888963407) & (
                (1 << 63) - 1
            )
            return _builtin_fake(method, self._state)

        return _gen


class FakerTextFactory(PyfuncTextFactory):
    """Faker-backed factory (reference ``text_generator_plugins.py:315-436``):
    ``FakerTextFactory(locale=...)("email")``. Falls back to the
    deterministic builtin value table when the ``faker`` package is not
    installed, keeping the plumbing (init, root property, method
    dispatch) identical."""

    def __init__(self, locale=None, providers=None, name: str = "FakerText",
                 lib: str = "faker", rootClass: str = "Faker"):
        super().__init__(name=name)

        def _init(ctx, _locale=locale, _providers=providers, _lib=lib,
                  _cls=rootClass):
            try:
                mod = __import__(_lib)
                faker_cls = getattr(mod, _cls)
                root = faker_cls(_locale) if _locale else faker_cls()
                if _providers:
                    for p in _providers:
                        root.add_provider(p)
            except ImportError:
                root = _BuiltinFakerShim()
            ctx.faker = root

        self.withInit(_init)
        self.withRootProperty("faker")


class FakerText(TextGenerator):
    """Faker-backed text generator object: ``text=fakerText("email")``.

    Uses the same pooled architecture as the declarative FakerColumn
    (driver-side value pool, executor-side mixed indexing) — real ``faker``
    when importable, deterministic builtin provider otherwise.
    """

    def __init__(self, method: str, locale: Optional[str] = None,
                 pool_size: int = 10000):
        self.method = method
        self.locale = locale
        self.pool_size = pool_size

    def make_expr(self, seed_col: Column, base_col: Optional[Column] = None) -> Column:
        from dbldatagen_spark.operators.text import faker_pool_expr
        from dbldatagen_spark.plans.spec import FakerColumn

        spec = FakerColumn(
            method=self.method, locale=self.locale, pool_size=self.pool_size
        )
        return faker_pool_expr(spec, 0x5EED, seed_col.cast("long"))


def fakerText(method: str, locale: Optional[str] = None, **_kw) -> FakerText:
    """v0-compatible sugar for ``FakerTextFactory``-style usage."""
    return FakerText(method, locale)


class TemplateGenerator(TextGenerator):
    """Object form of the v0 template language, for
    ``withColumn(..., text=TemplateGenerator("ddd-ddd-dddd"))`` —
    equivalent to passing ``template=`` (reference
    ``text_generators.py:413-995``)."""

    def __init__(self, template: str, escapeSpecialChars: bool = False,
                 mode: str = "udf"):
        if mode not in ("udf", "expr"):
            raise ValueError(f"mode must be 'udf' or 'expr', got {mode!r}")
        self.template = template
        self.escapeSpecialChars = escapeSpecialChars
        # "expr" compiles the template to pure Catalyst expressions (see
        # template_expr): no Python in the plan, a different-but-equally-
        # deterministic draw stream than the default pandas-UDF path
        self.mode = mode
        self._compiled = compile_template(template, escapeSpecialChars)

    @property
    def templates(self) -> List["CompiledTemplate"]:
        """The compiled ``|``-separated alternatives."""
        return list(self._compiled)

    def pandasGenerateText(self, v: "pd.Series") -> "pd.Series":
        """Vectorized expansion over a pandas Series of base values
        (seeds derive from the positional index — standalone use; inside
        the engine the partition-independent cell seed drives expansion)."""
        seeds = np.asarray(v.index, dtype=np.int64)
        return expand_templates(self._compiled, seeds, v)

    def make_expr(self, seed_col: Column, base_col: Optional[Column] = None) -> Column:
        if self.mode == "expr":
            return template_expr(
                self.template, seed_col, base_col, self.escapeSpecialChars
            )
        return template_udf_expr(
            self.template, seed_col, base_col, self.escapeSpecialChars
        )
