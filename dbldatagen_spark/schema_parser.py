"""SQL type-string and CREATE TABLE DDL parsing.

Capability parity with the reference's ``schema_parser.py`` (pyparsing
grammar at ``/root/reference/dbldatagen/schema_parser.py:40-256`` for type
strings, ``:363-395`` for ``parseCreateTable``), re-expressed Spark-first:
instead of a bespoke grammar we normalize the few non-Spark type synonyms
(``number`` -> ``decimal``, ``datetime`` -> ``timestamp``, ...) and delegate
to Spark's own DDL parser (``StructType.fromDDL``), which already handles
the full recursive type language (``array<...>``, ``map<...>``,
``struct<...>``, char/varchar, decimal precision/scale).

``interval`` is rejected as a field type, matching the reference
(``schema_parser.py:223-224``).
"""

from __future__ import annotations

import re
from typing import Union

from pyspark.sql import types as T

__all__ = ["SchemaParser"]

# type synonyms the reference accepts that Spark's DDL parser does not
# (reference schema_parser.py:181-256); applied word-wise so nested
# occurrences inside array<>/map<>/struct<> are covered too.
_TYPE_SYNONYMS = {
    "number": "decimal",
    "numeric": "decimal",
    "datetime": "timestamp",
    "bool": "boolean",
    "text": "string",
}

_WORD_RE = re.compile(r"\b[a-zA-Z_][a-zA-Z0-9_]*\b")


def _normalize_type_text(type_string: str) -> str:
    def sub(m: re.Match) -> str:
        return _TYPE_SYNONYMS.get(m.group(0).lower(), m.group(0))

    return _WORD_RE.sub(sub, type_string)


def _reject_interval(type_string: str) -> None:
    for m in _WORD_RE.finditer(type_string):
        if m.group(0).lower() == "interval":
            raise ValueError(
                "'interval' is not supported as a field data type "
                "(reference schema_parser.py:223-224)"
            )


class SchemaParser:
    """Parse SQL type strings and ``CREATE TABLE`` statements to Spark types.

    All parsing is driver-side and requires an active ``SparkSession``
    only insofar as ``StructType.fromDDL`` does.
    """

    @classmethod
    def columnTypeFromString(cls, type_string: str) -> T.DataType:
        """``"decimal(10,2)"`` -> ``DecimalType(10, 2)`` etc.

        Accepts every Spark SQL type plus the reference's synonyms
        (``number``/``numeric``/``datetime``/``bool``/``text``).
        """
        if not isinstance(type_string, str) or not type_string.strip():
            raise ValueError(f"invalid type string: {type_string!r}")
        _reject_interval(type_string)
        normalized = _normalize_type_text(type_string.strip())
        try:
            struct = T.StructType.fromDDL(f"__c {normalized}")
        except Exception as exc:  # Spark raises ParseException subclasses
            raise ValueError(
                f"cannot parse type string {type_string!r}: {exc}"
            ) from exc
        return struct.fields[0].dataType

    # reference spells it both ways across versions
    getTypeFromString = columnTypeFromString

    class _TypeDefinitionParser:
        """Minimal stand-in for the reference's pyparsing type grammar
        (``schema_parser.py:40-179``): exposes ``parseString`` returning
        the Spark ``DataType`` directly (the reference's parser returns
        an AST that ``columnTypeFromString`` then converts — here the
        conversion is one step)."""

        def parseString(self, type_string: str, parseAll: bool = True):
            return SchemaParser.columnTypeFromString(type_string)

        __call__ = parseString

    @classmethod
    def getTypeDefinitionParser(cls):
        """A parser object for Spark SQL type definitions (reference
        ``schema_parser.py:40-179``); ``parseString("array<int>")`` etc.
        accepts the same recursive type language, returning the Spark
        type."""
        return cls._TypeDefinitionParser()

    @classmethod
    def columnsReferencesFromSQLString(cls, sql_string, filterItems=None):
        """Candidate column references in a SQL string (reference
        ``schema_parser.py:329-361``): a textual identifier scan, not a
        full SQL parse — string literals are blanked first so their
        contents are never treated as references, backquoted identifiers
        are honored, and reserved words may appear in the result (callers
        must not assume every candidate is a real column). With
        ``filterItems`` the result keeps only those names."""
        if sql_string is None:
            raise ValueError("`sql_string` must be specified")
        if filterItems is not None and not isinstance(filterItems, (list, set)):
            raise ValueError("`filterItems` must be a list or set")
        # blank out single-quoted literals ('' escapes included)
        cleansed = re.sub(r"'(?:[^']|'')*'", "' '", str(sql_string))
        refs = []
        for m in re.finditer(r"`((?:[^`]|``)+)`|([A-Za-z][A-Za-z0-9_]*)",
                             cleansed):
            name = m.group(1) if m.group(1) is not None else m.group(2)
            if m.group(1) is not None:
                name = name.replace("``", "`")
            refs.append(name)
        if filterItems is not None:
            allowed = set(filterItems)
            refs = [r for r in refs if r in allowed]
        # de-duplicate preserving first occurrence
        seen = set()
        out = []
        for r in refs:
            if r not in seen:
                seen.add(r)
                out.append(r)
        return out

    @classmethod
    def parseCreateTable(cls, sparkSession, source: str) -> T.StructType:
        """Extract the column list of a ``CREATE TABLE`` statement as a
        ``StructType`` (reference ``schema_parser.py:363-395``).

        Handles backquoted identifiers, ``IF NOT EXISTS``, trailing
        ``USING``/``PARTITIONED BY``/``LOCATION``/``TBLPROPERTIES``
        clauses, ``NOT NULL`` markers, and nested types, by delegating the
        inner column list to Spark's DDL parser.
        """
        if source is None or not str(source).strip():
            raise ValueError("no table definition supplied")
        text = str(source).strip()
        m = re.match(
            r"(?is)^\s*create\s+(?:or\s+replace\s+)?(?:external\s+)?"
            r"(?:temporary\s+|temp\s+)?table\s+(?:if\s+not\s+exists\s+)?"
            r"[`\"\w.]+\s*\(",
            text,
        )
        if not m:
            raise ValueError(f"not a CREATE TABLE statement: {source!r}")
        # find the matching close paren of the column list
        start = m.end() - 1
        depth = 0
        end = -1
        for i in range(start, len(text)):
            ch = text[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise ValueError("unbalanced parentheses in CREATE TABLE")
        inner = text[start + 1 : end].strip()
        if not inner:
            raise ValueError("CREATE TABLE has an empty column list")
        _reject_interval(inner)
        # strip COMMENT '...' clauses (DDL parser accepts them, but the
        # reference drops them; keep behavior identical either way)
        normalized = _normalize_type_text(inner).replace("`", "")
        try:
            return T.StructType.fromDDL(normalized)
        except Exception:
            # retry without NOT NULL markers (older DDL parser variants)
            stripped = re.sub(r"(?i)\bnot\s+null\b", "", normalized)
            return T.StructType.fromDDL(stripped)
