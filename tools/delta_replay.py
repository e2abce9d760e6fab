#!/usr/bin/env python3
"""Minimal INDEPENDENT Delta Lake reader (pure python + DuckDB).

Implements the Delta transaction protocol (PROTOCOL.md) directly —
log listing, checkpoint + commit-JSON replay, column mapping,
partition-value injection, deletion-vector decoding (z85 + 64-bit
RoaringBitmapArray, file and inline forms) — sharing ZERO code with the
Scala engine in src/. Purpose: a cross-implementation differential for
graft's WRITER. The sandbox has no third-party Delta reader (delta-rs
wheel absent, DuckDB delta extension uninstallable offline), so this
tool closes as much of the second-reader gap as an in-repo
implementation can: it is a different implementation, in a different
language, on a different parquet engine, written against the spec.

Usage:
  delta_replay.py TABLE_PATH                  # print row count + schema
  delta_replay.py TABLE_PATH --csv            # dump rows as CSV
  delta_replay.py TABLE_PATH --diff SPARK_DIR # bag-diff vs a parquet dir
  delta_replay.py TABLE_PATH --version N      # time travel
  delta_replay.py TABLE_PATH --timestamp-ms T # timestamp travel (ICT-aware)
  delta_replay.py TABLE_PATH --cdf SPARK_DIR  # change-feed bag-diff
  delta_replay.py TABLE_PATH --txn            # {appId: version} ledger

--diff / --cdf print one JSON line
{"rows": N, "only_replay": a, "only_spark": b} and exit 1 unless
a == b == 0. --cdf replays the CHANGE FEED: per commit, stored cdc
actions are preferred exclusively (update_pre/postimages normalized
onto delete/insert, per the protocol's CDF read contract), else
dataChange=true adds derive an insert batch. DV-diff-derived deletes
of non-CDF commits are out of scope — on a CDF-enabled table every
DELETE/UPDATE/MERGE stores cdc, so the feed is complete.

Scope limits (documented, asserted loudly): top-level column mapping
only (no renamed fields INSIDE nested structs), storageType u/i DVs
(p supported when under the table root), reader features up to
{columnMapping, deletionVectors, timestampNtz, v2Checkpoint}.
"""
import json
import os
import re
import struct
import sys
import urllib.parse

import duckdb

# ---------------------------------------------------------------- z85 --
Z85_ALPHABET = ("0123456789abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
Z85_DECODE = {c: i for i, c in enumerate(Z85_ALPHABET)}


def z85_decode(s):
    assert len(s) % 5 == 0, "z85 needs a multiple of 5 chars"
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + Z85_DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------- roaring bitmap (portable) --
# Spec: https://github.com/RoaringBitmap/RoaringFormatSpec
SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4


def read_roaring(buf, pos):
    """Parse one portable 32-bit RoaringBitmap at buf[pos:]; return
    (sorted values, next position)."""
    # UNSIGNED reads: with >= 0x8000 containers the signed cookie goes
    # negative, (cookie >> 16) + 1 with it, and the bitmap would decode
    # as EMPTY - resurrecting deleted rows silently
    cookie = struct.unpack_from("<I", buf, pos)[0]
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        runbits = buf[pos:pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        pos += 4
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        runbits = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential read
    values = []
    for i in range(n):
        base = keys[i] << 16
        if runbits[i // 8] & (1 << (i % 8)):  # run container
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:  # array container
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:  # bitmap container: 1024 x uint64
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


def dv_row_indexes(data):
    """64-bit row indexes from DV data bytes:
    [magic int32 LE][nBitmaps int64 LE][portable RoaringBitmap per bucket]."""
    magic = struct.unpack_from("<i", data, 0)[0]
    assert magic == 1681511377, f"bad DV magic {magic}"
    n = struct.unpack_from("<q", data, 4)[0]
    pos, out = 12, []
    for key in range(n):
        vals, pos = read_roaring(data, pos)
        out.extend((key << 32) | v for v in vals)
    return out


def load_dv(table, dv):
    """Deleted row indexes for an add.deletionVector descriptor."""
    st = dv["storageType"]
    if st == "i":
        raw = z85_decode(dv["pathOrInlineDv"])
        size = dv.get("sizeInBytes") or 0
        return dv_row_indexes(raw[:size] if 0 < size < len(raw) else raw)
    if st in ("u", "p"):
        if st == "u":
            enc = dv["pathOrInlineDv"]
            prefix, u = enc[:-20], enc[-20:]
            uuid_bytes = z85_decode(u)
            hexs = uuid_bytes.hex()
            uuid = f"{hexs[:8]}-{hexs[8:12]}-{hexs[12:16]}-{hexs[16:20]}-{hexs[20:]}"
            name = f"deletion_vector_{uuid}.bin"
            path = os.path.join(table, prefix, name) if prefix else os.path.join(table, name)
        else:
            path = dv["pathOrInlineDv"]
            if path.startswith("file:"):
                path = urllib.parse.urlparse(path).path
        with open(path, "rb") as f:
            f.seek(dv.get("offset") or 1)
            size = struct.unpack(">i", f.read(4))[0]
            assert size == dv["sizeInBytes"], "DV size mismatch"
            return dv_row_indexes(f.read(size))
    raise ValueError(f"unknown DV storageType {st}")


# --------------------------------------------------------- log replay --
SUPPORTED_READER_FEATURES = {
    "columnMapping", "deletionVectors", "timestampNtz", "v2Checkpoint",
    # typeWidening: old files keep the narrow physical type; this
    # reader already CASTs every file column to the logical type
    # (physical_to_logical), which IS the feature's read obligation
    "typeWidening"}


def log_files(logdir):
    return sorted(os.listdir(logdir)) if os.path.isdir(logdir) else []


def best_checkpoint(names, version):
    """Greatest checkpoint version <= `version` (None = latest), with its
    files: classic single, multi-part classic, or v2 uuid-named."""
    cps = {}
    pat = re.compile(r"^(\d{20})\.checkpoint(\..*)?\.(parquet|json)$")
    for n in names:
        m = pat.match(n)
        if m:
            v = int(m.group(1))
            if version is None or v <= version:
                cps.setdefault(v, []).append(n)
    if not cps:
        return None, []
    v = max(cps)
    return v, sorted(cps[v])


def checkpoint_rows(con, logdir, files):
    """Checkpoint action rows as JSON objects (nulls pruned), resolving
    v2 sidecars."""
    pq = [os.path.join(logdir, f) for f in files if f.endswith(".parquet")]
    js = [os.path.join(logdir, f) for f in files if f.endswith(".json")]
    rows = []
    if pq:
        for (j,) in con.execute(
                f"SELECT to_json(t) FROM read_parquet({pq!r}) t").fetchall():
            rows.append(json.loads(j))
    for f in js:
        with open(f) as fh:
            rows.extend(json.loads(l) for l in fh if l.strip())
    sidecars = [r["sidecar"]["path"] for r in rows
                if r.get("sidecar") and r["sidecar"].get("path")]
    for sp in sidecars:
        full = sp if (os.path.isabs(sp) or "://" in sp) \
            else os.path.join(logdir, "_sidecars", sp)
        for (j,) in con.execute(
                f"SELECT to_json(t) FROM read_parquet({full!r}) t").fetchall():
            rows.append(json.loads(j))
    return rows


def prune(x):
    """Drop null entries so checkpoint rows look like commit actions."""
    if isinstance(x, dict):
        return {k: prune(v) for k, v in x.items() if v is not None}
    return x


def replay(con, table, version=None, txns=None):
    """Fold the log into (metadata, protocol, {path: add}). When `txns`
    is a dict it also folds `txn` (SetTransaction) actions into it —
    appId -> version, latest occurrence in log order wins — so a caller
    can compare streaming-ledger watermarks across implementations."""
    logdir = os.path.join(table, "_delta_log")
    names = log_files(logdir)
    cp_version, cp_files = best_checkpoint(names, version)
    adds, meta, proto = {}, None, None

    def apply(action, allow_remove=True):
        nonlocal meta, proto
        a = prune(action)
        if a.get("metaData"):
            meta = a["metaData"]
        if a.get("protocol"):
            proto = a["protocol"]
        if txns is not None and a.get("txn"):
            txns[a["txn"]["appId"]] = a["txn"]["version"]
        if a.get("add"):
            adds[a["add"]["path"]] = a["add"]
        if allow_remove and a.get("remove"):
            adds.pop(a["remove"]["path"], None)

    start = 0
    if cp_version is not None:
        for r in checkpoint_rows(con, logdir, cp_files):
            apply(r, allow_remove=False)  # checkpoints carry only tombstones
        start = cp_version + 1
    v = start
    found_any = cp_version is not None
    while version is None or v <= version:
        f = os.path.join(logdir, f"{v:020d}.json")
        if not os.path.exists(f):
            break
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    apply(json.loads(line))
        found_any = True
        v += 1
    assert found_any, f"no log found for {table} at version {version}"
    assert meta is not None, "no metaData in log"
    if proto:
        assert proto.get("minReaderVersion", 1) <= 3, proto
        unsupported = set(proto.get("readerFeatures") or []) - SUPPORTED_READER_FEATURES
        assert not unsupported, f"unsupported reader features {unsupported}"
    return meta, proto, list(adds.values())


# ----------------------------------------------- schema / type mapping --
def version_at_timestamp(table, ts_ms):
    """Greatest version whose effective commit timestamp <= ts_ms —
    timestamp time travel. If the NEWEST commit carries
    commitInfo.inCommitTimestamp (PROTOCOL.md#in-commit-timestamps),
    every commit resolves by its own ICT (file-mtime fallback per
    commit); otherwise by commit-file mtimes. Timestamps are
    monotonized in version order, so clock skew or restored backups
    can't make a version resolve older than its predecessor."""
    logdir = os.path.join(table, "_delta_log")
    pat = re.compile(r"^(\d{20})\.json$")
    commits = sorted(int(m.group(1)) for n in log_files(logdir)
                     if (m := pat.match(n)))
    assert commits, f"no commits under {logdir}"

    def ict(v):
        with open(os.path.join(logdir, f"{v:020d}.json")) as fh:
            for line in fh:
                if line.strip():
                    ci = json.loads(line).get("commitInfo")
                    if ci and ci.get("inCommitTimestamp") is not None:
                        return ci["inCommitTimestamp"]
        return None

    use_ict = ict(commits[-1]) is not None
    timeline, prev = [], None
    for v in commits:
        t = ict(v) if use_ict else None
        if t is None:
            t = int(os.path.getmtime(
                os.path.join(logdir, f"{v:020d}.json")) * 1000)
        if prev is not None and t < prev:
            t = prev
        prev = t
        timeline.append((v, t))
    eligible = [v for v, t in timeline if t <= ts_ms]
    assert eligible, f"no version of {table} at or before {ts_ms}"
    return max(eligible)


def duck_type(t):
    """Delta schema JSON type -> DuckDB SQL type."""
    if isinstance(t, str):
        m = {"string": "VARCHAR", "long": "BIGINT", "integer": "INTEGER",
             "short": "SMALLINT", "byte": "TINYINT", "double": "DOUBLE",
             "float": "FLOAT", "boolean": "BOOLEAN", "binary": "BLOB",
             "date": "DATE", "timestamp": "TIMESTAMP",
             "timestamp_ntz": "TIMESTAMP"}
        if t in m:
            return m[t]
        dm = re.match(r"^decimal\((\d+),(\d+)\)$", t)
        if dm:
            return f"DECIMAL({dm.group(1)},{dm.group(2)})"
        raise ValueError(f"unmapped delta type {t}")
    if t["type"] == "struct":
        inner = ", ".join(
            f'"{f["name"]}" {duck_type(f["type"])}' for f in t["fields"])
        return f"STRUCT({inner})"
    if t["type"] == "array":
        return f"{duck_type(t['elementType'])}[]"
    if t["type"] == "map":
        return f"MAP({duck_type(t['keyType'])}, {duck_type(t['valueType'])})"
    raise ValueError(f"unmapped delta type {t}")


def top_fields(meta):
    """[(logical, physical, ducktype, delta_type)] for the top-level
    schema (delta_type keeps nested metadata for the physical→logical
    rewrite)."""
    schema = json.loads(meta["schemaString"])
    mapped = meta.get("configuration", {}).get(
        "delta.columnMapping.mode", "none") != "none"
    out = []
    for f in schema["fields"]:
        phys = f.get("metadata", {}).get(
            "delta.columnMapping.physicalName", f["name"]) if mapped else f["name"]
        out.append((f["name"], phys, duck_type(f["type"]), f["type"]))
    return out


def sq(name):
    return name.replace("'", "''")


def physical_to_logical(src, t, mapped, depth=0):
    """SQL expression converting the physically-named value `src` to the
    LOGICAL layout + type — the python twin of the engine's one-Cast
    rewrite: struct fields renamed (by physicalName lookup), NULL
    structs preserved, arrays/maps rewritten element-wise."""
    if isinstance(t, str) or t.get("type") not in ("struct", "array", "map"):
        return f"CAST({src} AS {duck_type(t)})"
    if t["type"] == "struct":
        members = []
        for f in t["fields"]:
            phys = f.get("metadata", {}).get(
                "delta.columnMapping.physicalName", f["name"]) \
                if mapped else f["name"]
            inner = physical_to_logical(
                f"struct_extract({src}, '{sq(phys)}')", f["type"], mapped,
                depth + 1)
            members.append(f"'{sq(f['name'])}': {inner}")
        return (f"CASE WHEN {src} IS NULL THEN NULL "
                f"ELSE {{{', '.join(members)}}} END")
    if t["type"] == "array":
        var = f"__e{depth}"
        inner = physical_to_logical(var, t["elementType"], mapped, depth + 1)
        return f"list_transform({src}, {var} -> {inner})"
    kv, vv = f"__k{depth}", f"__v{depth}"
    ki = physical_to_logical(kv, t["keyType"], mapped, depth + 1)
    vi = physical_to_logical(vv, t["valueType"], mapped, depth + 1)
    return (f"map(list_transform(map_keys({src}), {kv} -> {ki}), "
            f"list_transform(map_values({src}), {vv} -> {vi}))")


# ------------------------------------------------------- scan building --
def file_select(con, table, add, fields, part_phys, change_type=None,
                mapped=False):
    """One per-file SELECT in LOGICAL schema order, DV-filtered.
    change_type: None = plain scan; "insert" = derived-CDF literal;
    "stored" = read the cdc file's own _change_type, normalized
    (update_preimage -> delete, update_postimage -> insert)."""
    # add.path is normally RELATIVE and percent-encoded, but shallow
    # clones emit absolute percent-encoded URIs (scheme + authority
    # preserved); decode the path COMPONENT after parsing, not before —
    # unquoting first would corrupt a path containing literal '%XX'
    raw = add["path"]
    if raw.startswith("file:"):
        fpath = urllib.parse.unquote(urllib.parse.urlparse(raw).path)
    else:
        rel = urllib.parse.unquote(raw)
        fpath = os.path.join(table, rel)  # absolute rel stays absolute
    present = {r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({fpath!r})").fetchall()}
    pv = add.get("partitionValues") or {}
    cols = []
    for logical, phys, dtype, dt in fields:
        if phys in part_phys:
            v = pv.get(phys)
            if v is None:
                cols.append(f'CAST(NULL AS {dtype}) AS "{logical}"')
            else:
                lit = "'" + str(v).replace("'", "''") + "'"
                cols.append(f'CAST({lit} AS {dtype}) AS "{logical}"')
        elif phys in present:
            qp = '"' + phys.replace('"', '""') + '"'
            cols.append(
                f'{physical_to_logical(qp, dt, mapped)} AS "{logical}"')
        else:  # schema evolution: file predates the column
            cols.append(f'CAST(NULL AS {dtype}) AS "{logical}"')
    if change_type == "stored":
        cols.append("CASE \"_change_type\" "
                    "WHEN 'update_preimage' THEN 'delete' "
                    "WHEN 'update_postimage' THEN 'insert' "
                    "ELSE \"_change_type\" END AS \"_change_type\"")
    elif change_type is not None:
        cols.append(f"'{change_type}' AS \"_change_type\"")
    sel = (f"SELECT {', '.join(cols)} FROM "
           f"read_parquet({fpath!r}, file_row_number=true)")
    dv = add.get("deletionVector")
    if dv and dv.get("storageType"):
        deleted = load_dv(table, dv)
        if deleted:
            sel += f" WHERE file_row_number NOT IN ({','.join(map(str, deleted))})"
    return sel


def build_view(con, table, version):
    meta, proto, adds = replay(con, table, version)
    fields = top_fields(meta)
    mapped = meta.get("configuration", {}).get(
        "delta.columnMapping.mode", "none") != "none"
    logical_parts = meta.get("partitionColumns") or []
    by_logical = {l: p for l, p, _, _ in fields}
    part_phys = {by_logical[c] if mapped else c for c in logical_parts}
    if adds:
        union = " UNION ALL ".join(
            file_select(con, table, a, fields, part_phys, mapped=mapped)
            for a in adds)
    else:
        union = ("SELECT " + ", ".join(
            f'CAST(NULL AS {d}) AS "{l}"' for l, _, d, _ in fields) +
            " WHERE 1=0")
    con.execute(f"CREATE OR REPLACE VIEW replayed AS {union}")
    return fields


def build_cdf_view(con, table, since=-1, until=None):
    """Replay the CHANGE FEED: per commit, stored cdc actions win
    exclusively (the protocol's CDF read contract — the commit's
    add/remove actions are then IGNORED for the feed), else
    dataChange=true adds derive an insert batch. Window bounds match
    the engine's scanDeltaCdf: `since` EXCLUSIVE (default -1 = from
    version 0), `until` INCLUSIVE (default head). Final logical schema
    is applied throughout (battery tables don't evolve mid-feed)."""
    meta, _, _ = replay(con, table)
    fields = top_fields(meta)
    mapped = meta.get("configuration", {}).get(
        "delta.columnMapping.mode", "none") != "none"
    logical_parts = meta.get("partitionColumns") or []
    by_logical = {l: p for l, p, _, _ in fields}
    part_phys = {by_logical[c] if mapped else c for c in logical_parts}
    logdir = os.path.join(table, "_delta_log")
    selects, v = [], since + 1
    while until is None or v <= until:
        f = os.path.join(logdir, f"{v:020d}.json")
        if not os.path.exists(f):
            break
        with open(f) as fh:
            actions = [prune(json.loads(l)) for l in fh if l.strip()]
        cdcs = [a["cdc"] for a in actions if a.get("cdc")]
        if cdcs:
            selects.extend(
                file_select(con, table, c, fields, part_phys, "stored",
                            mapped=mapped)
                for c in cdcs)
        else:
            selects.extend(
                file_select(con, table, a["add"], fields, part_phys,
                            "insert", mapped=mapped)
                for a in actions
                if a.get("add") and a["add"].get("dataChange", True))
        v += 1
    if not selects:
        # a BOUNDED window can legitimately contain no change-producing
        # commits — replay an empty feed like the engine does; the
        # unbounded form still refuses (it means a wrong table path)
        assert since > -1 or until is not None, \
            f"no commits found under {logdir}"
        cols = ", ".join(f'CAST(NULL AS {d}) AS "{l}"'
                         for l, _, d, _ in fields)
        con.execute(
            "CREATE OR REPLACE VIEW cdf_replayed AS "
            f"SELECT {cols}, CAST(NULL AS VARCHAR) AS \"_change_type\" "
            "WHERE 1=0")
        return fields
    con.execute(
        "CREATE OR REPLACE VIEW cdf_replayed AS " + " UNION ALL ".join(selects))
    return fields


def bag_diff(con, left_view, spark_dir, col_names, col_types=None):
    # cast the spark side to the SAME logical duckdb types the replay
    # produced (TIMESTAMPTZ parquet vs TIMESTAMP etc. — the session is
    # pinned to UTC so instant-preserving casts are deterministic)
    types = dict(col_types or [])
    cols = ", ".join(
        f'CAST("{c}" AS {types[c]}) AS "{c}"' if c in types else f'"{c}"'
        for c in col_names)
    con.execute(
        f"CREATE OR REPLACE VIEW spark_side AS "
        f"SELECT {cols} FROM read_parquet({spark_dir + '/*.parquet'!r})")
    n = con.execute(f"SELECT count(*) FROM {left_view}").fetchone()[0]
    a = con.execute(f"SELECT count(*) FROM (SELECT * FROM {left_view} "
                    "EXCEPT ALL SELECT * FROM spark_side)").fetchone()[0]
    b = con.execute("SELECT count(*) FROM (SELECT * FROM spark_side "
                    f"EXCEPT ALL SELECT * FROM {left_view})").fetchone()[0]
    print(json.dumps({"rows": n, "only_replay": a, "only_spark": b}))
    sys.exit(0 if (a == 0 and b == 0) else 1)


def main():
    args = sys.argv[1:]
    assert args, __doc__
    table = args[0]
    version = None
    if "--version" in args:
        version = int(args[args.index("--version") + 1])
    elif "--timestamp-ms" in args:
        version = version_at_timestamp(
            table, int(args[args.index("--timestamp-ms") + 1]))
    con = duckdb.connect()
    con.execute("SET timezone = 'UTC'")
    if "--txn" in args:
        # streaming-ledger watermarks: {appId: version} folded from the
        # log (checkpoints included), independent of the engine's replay
        txns = {}
        replay(con, table, version, txns=txns)
        print(json.dumps({"txn": dict(sorted(txns.items()))}))
        return
    if "--cdf" in args:
        since = (int(args[args.index("--cdf-since") + 1])
                 if "--cdf-since" in args else -1)
        until = (int(args[args.index("--cdf-until") + 1])
                 if "--cdf-until" in args else None)
        fields = build_cdf_view(con, table, since, until)
        bag_diff(con, "cdf_replayed", args[args.index("--cdf") + 1],
                 [l for l, _, _, _ in fields] + ["_change_type"],
                 [(l, d) for l, _, d, _ in fields])
        return
    fields = build_view(con, table, version)
    if "--diff" in args:
        bag_diff(con, "replayed", args[args.index("--diff") + 1],
                 [l for l, _, _, _ in fields],
                 [(l, d) for l, _, d, _ in fields])
    elif "--csv" in args:
        for row in con.execute(
                "SELECT * FROM replayed ORDER BY ALL").fetchall():
            print(",".join("" if v is None else str(v) for v in row))
    else:
        n = con.execute("SELECT count(*) FROM replayed").fetchone()[0]
        print(json.dumps({"rows": n,
                          "columns": [l for l, _, _, _ in fields]}))


if __name__ == "__main__":
    main()
