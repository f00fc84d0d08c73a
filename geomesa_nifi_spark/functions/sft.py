"""Declared-schema resolver: GeoMesa SFT specs -> Spark StructType.

The reference's primary way to *declare* a schema is a spec string or a
typesafe-config blob resolved by ``SftArgResolver`` and validated before the
flow runs (``mixins/FeatureTypeProcessor.scala:70-92,121-128``; validation
``validators/SimpleFeatureTypeValidator.scala:22-26``).  This module parses
both public syntaxes into the engine's native terms — a ``StructType`` plus
the declared options (default geometry, id/dtg hints, user data) — so a
reference user's existing SFT configs work unchanged:

* spec string: ``"name:String,age:Int,dtg:Date,*geom:Point:srid=4326;
  geomesa.user.key='value'"`` — comma-separated ``name:Type[:opt=val]*``
  fields, ``*`` marks the default geometry, an optional ``;``-suffix carries
  user-data ``key=value`` pairs.
* typesafe config: ``geomesa { sfts { <name> = { fields = [ {name = ...,
  type = ...} ], user-data { ... } } } }`` (the shape exercised by
  ``validators/SimpleFeatureTypeValidatorTest.scala:19-27``).

Geometry attribute types are carried as validated WKT strings — the same
mapping the converter uses (SURVEY.md §1.3) — with the declared geometry
kind and srid preserved in the field metadata.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T


class SftParseError(ValueError):
    """Raised when a spec/config is not a valid simple feature type
    (the reference reports these as validation failures,
    ``SimpleFeatureTypeValidator.scala:24-25``)."""


#: GeoMesa attribute type -> Spark type.  Date in GeoMesa is java.util.Date
#: (instant precision), so it maps to TimestampType; geometries ride as WKT.
_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "uuid": T.StringType(),
    "bytes": T.BinaryType(),
}

_GEOM_CANONICAL = {
    "point": "Point",
    "linestring": "LineString",
    "polygon": "Polygon",
    "multipoint": "MultiPoint",
    "multilinestring": "MultiLineString",
    "multipolygon": "MultiPolygon",
    "geometrycollection": "GeometryCollection",
    "geometry": "Geometry",
}
_GEOMETRIES = set(_GEOM_CANONICAL)

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")


@dataclass
class SftField:
    name: str
    spark_type: T.DataType
    is_default_geom: bool = False
    geom_type: str | None = None  # Point / Polygon / ... when a geometry
    options: dict[str, str] = field(default_factory=dict)  # srid=4326, index=true, ...


@dataclass
class Sft:
    """A resolved simple feature type: Spark schema + declared options."""

    name: str | None
    fields: list[SftField]
    user_data: dict[str, str] = field(default_factory=dict)

    @property
    def schema(self) -> T.StructType:
        out = []
        for f in self.fields:
            meta = dict(f.options)
            if f.geom_type:
                meta["geomesa.geom.type"] = f.geom_type
            if f.is_default_geom:
                meta["geomesa.geom.default"] = "true"
            out.append(T.StructField(f.name, f.spark_type, True, metadata=meta or None))
        return T.StructType(out)

    @property
    def default_geom(self) -> str | None:
        for f in self.fields:
            if f.is_default_geom:
                return f.name
        return None

    @property
    def dtg_field(self) -> str | None:
        """The declared default-date field: explicit ``geomesa.index.dtg``
        user data wins, else the first Date-typed attribute (the reference's
        resolution order)."""
        explicit = self.user_data.get("geomesa.index.dtg")
        if explicit:
            return explicit
        for f in self.fields:
            if isinstance(f.spark_type, (T.TimestampType, T.TimestampNTZType)):
                return f.name
        return None


def _parse_type(raw: str) -> tuple[T.DataType, str | None]:
    """'String' / 'List[Int]' / 'Map[String,Double]' / 'Point' ->
    (spark type, geometry kind or None)."""
    s = raw.strip()
    low = s.lower()
    m = re.fullmatch(r"(list)\[\s*([^\]]+)\s*\]", low)
    if m:
        inner, g = _parse_type(m.group(2))
        if g:
            raise SftParseError(f"geometry element type not supported in {raw!r}")
        return T.ArrayType(inner), None
    m = re.fullmatch(r"(map)\[\s*([^,\]]+)\s*,\s*([^\]]+)\s*\]", low)
    if m:
        k, gk = _parse_type(m.group(2))
        v, gv = _parse_type(m.group(3))
        if gk or gv:
            raise SftParseError(f"geometry key/value type not supported in {raw!r}")
        return T.MapType(k, v), None
    if low in _TYPES:
        return _TYPES[low], None
    if low in _GEOMETRIES:
        # carried as validated WKT (SURVEY.md §1.3); kind kept in metadata
        return T.StringType(), _GEOM_CANONICAL[low]
    raise SftParseError(f"unknown attribute type {raw!r}")


def parse_spec_string(spec: str, name: str | None = None) -> Sft:
    """Parse the comma-delimited spec syntax
    (``"name:String,age:Int,*geom:Point:srid=4326;key='value'"``)."""
    body, _, ud_part = spec.partition(";")
    fields: list[SftField] = []
    seen: set[str] = set()
    body = body.strip()
    if body:
        for part in _split_top_level(body, ","):
            part = part.strip()
            if not part:
                raise SftParseError(f"empty attribute in spec {spec!r}")
            is_default = part.startswith("*")
            if is_default:
                part = part[1:]
            pieces = _split_top_level(part, ":")
            if len(pieces) < 2:
                raise SftParseError(f"attribute {part!r} must be name:Type")
            fname = pieces[0].strip()
            if not _NAME_RE.match(fname):
                raise SftParseError(f"invalid attribute name {fname!r}")
            if fname in seen:
                raise SftParseError(f"duplicate attribute {fname!r}")
            seen.add(fname)
            spark_type, geom = _parse_type(pieces[1])
            if is_default and not geom:
                raise SftParseError(f"default-geometry flag on non-geometry {fname!r}")
            opts: dict[str, str] = {}
            for opt in pieces[2:]:
                k, eq, v = opt.partition("=")
                if not eq:
                    raise SftParseError(f"attribute option {opt!r} must be key=value")
                opts[k.strip()] = v.strip().strip("'\"")
            fields.append(SftField(fname, spark_type, is_default, geom, opts))
    user_data = {}
    if ud_part.strip():
        for pair in _split_top_level(ud_part, ","):
            k, eq, v = pair.partition("=")
            if not eq:
                raise SftParseError(f"user-data entry {pair!r} must be key=value")
            user_data[k.strip()] = v.strip().strip("'\"")
    if not fields and not user_data:
        raise SftParseError(f"empty spec {spec!r}")
    return Sft(name=name, fields=fields, user_data=user_data)


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside brackets/quotes (List[..] commas survive)."""
    out, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            buf.append(ch)
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


# ---------------------------------------------------------------------------
# typesafe-config (HOCON subset) syntax
# ---------------------------------------------------------------------------


def _tokenize_hocon(s: str) -> list[str]:
    tokens = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in " \t\r\n,":
            i += 1
        elif ch in "{}[]=:":
            tokens.append(ch)
            i += 1
        elif ch == "#" or s[i : i + 2] == "//":
            while i < n and s[i] != "\n":
                i += 1
        elif ch in "'\"":
            j = i + 1
            while j < n and s[j] != ch:
                j += 1
            if j >= n:
                raise SftParseError("unterminated string in config")
            tokens.append(s[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in " \t\r\n,{}[]=:#":
                j += 1
            tokens.append(s[i:j])
            i = j
    return tokens


def _parse_hocon_value(tokens: list[str], i: int):
    tok = tokens[i]
    if tok == "{":
        obj: dict = {}
        i += 1
        while tokens[i] != "}":
            key = tokens[i]
            i += 1
            if tokens[i] in "=:":
                i += 1
            val, i = _parse_hocon_value(tokens, i)
            obj[key] = val
        return obj, i + 1
    if tok == "[":
        arr = []
        i += 1
        while tokens[i] != "]":
            val, i = _parse_hocon_value(tokens, i)
            arr.append(val)
        return arr, i + 1
    return tok, i + 1


def parse_config(text: str, name: str | None = None) -> Sft:
    """Parse the typesafe-config syntax the reference validates
    (``geomesa { sfts { <name> = { fields = [...] } } }``)."""
    try:
        tokens = _tokenize_hocon(text)
        if not tokens:
            raise SftParseError("empty config")
        root, i = _parse_hocon_value(tokens, 0) if tokens[0] == "{" else _parse_hocon_obj_bare(tokens)
    except SftParseError:
        raise
    except Exception as e:  # malformed nesting -> index errors etc.
        raise SftParseError(f"not a valid simple feature type config: {e}") from None
    if not isinstance(root, dict):
        raise SftParseError("config root must be an object")
    geomesa = root.get("geomesa")
    if not isinstance(geomesa, dict):
        raise SftParseError("missing 'geomesa' block")
    sfts = geomesa.get("sfts")
    if not isinstance(sfts, dict) or not sfts:
        raise SftParseError("geomesa.sfts must define at least one type")
    if name is not None and name in sfts:
        sft_name, conf = name, sfts[name]
    else:
        sft_name, conf = next(iter(sfts.items()))
    if not isinstance(conf, dict) or "fields" not in conf:
        raise SftParseError(f"sft {sft_name!r} must declare a 'fields' list")
    raw_fields = conf["fields"]
    if not isinstance(raw_fields, list):
        raise SftParseError("'fields' must be a list")
    fields: list[SftField] = []
    seen: set[str] = set()
    for rf in raw_fields:
        if not isinstance(rf, dict) or "name" not in rf or "type" not in rf:
            raise SftParseError(f"field {rf!r} needs 'name' and 'type'")
        fname = str(rf["name"])
        if not _NAME_RE.match(fname):
            raise SftParseError(f"invalid attribute name {fname!r}")
        if fname in seen:
            raise SftParseError(f"duplicate attribute {fname!r}")
        seen.add(fname)
        spark_type, geom = _parse_type(str(rf["type"]))
        opts = {
            k: str(v)
            for k, v in rf.items()
            if k not in ("name", "type", "default") and not isinstance(v, (dict, list))
        }
        is_default = str(rf.get("default", "false")).lower() == "true"
        if is_default and not geom:
            raise SftParseError(f"default-geometry flag on non-geometry {fname!r}")
        fields.append(SftField(fname, spark_type, is_default, geom, opts))
    # single geometry field is implicitly the default one (reference behavior)
    geoms = [f for f in fields if f.geom_type]
    if len(geoms) == 1 and not any(f.is_default_geom for f in fields):
        geoms[0].is_default_geom = True
    ud = conf.get("user-data", {})
    user_data = {k: str(v) for k, v in ud.items()} if isinstance(ud, dict) else {}
    return Sft(name=name or sft_name, fields=fields, user_data=user_data)


def _parse_hocon_obj_bare(tokens: list[str]):
    """Root object without surrounding braces (valid HOCON)."""
    obj: dict = {}
    i = 0
    while i < len(tokens):
        key = tokens[i]
        i += 1
        if i < len(tokens) and tokens[i] in "=:":
            i += 1
        if i >= len(tokens):
            raise SftParseError(f"dangling key {key!r}")
        val, i = _parse_hocon_value(tokens, i)
        obj[key] = val
    return obj, i


def resolve_sft(arg: str, name: str | None = None) -> Sft:
    """The ``SftArgResolver.getArg(SftArgs(spec, name))`` analogue: accept
    either syntax, raise ``SftParseError`` when neither parses — the same
    contract the reference's processor validation applies up front."""
    s = arg.strip()
    if "{" in s:
        return parse_config(s, name)
    return parse_spec_string(s, name)
