"""Embedded-mode CLI, mirroring the reference's factstore-cli commands
(factstore-cli/src/main/kotlin/io/factstore/cli/command/) against a
local engine root instead of a server.

    python -m factstore_spark --root /data/factstore create-store my-store
    python -m factstore_spark --root /data/factstore append my-store \
        --type OrderCreated --subject order/1 --payload '{"total": 10}' \
        --tag region=eu --tag vip=
    python -m factstore_spark --root /data/factstore find-by-subject my-store order/1
    python -m factstore_spark --root /data/factstore replay my-store

Output: one JSON object per fact / result on stdout.
"""

from __future__ import annotations

import argparse
import base64
import dataclasses
import json
import os
import sys


def _fact_json(f) -> str:
    return json.dumps(
        {
            "id": f.id,
            "type": f.type,
            "subject": f.subject,
            "appended_at": f.appended_at.isoformat(),
            "position": f.position,
            "payload": base64.b64encode(f.payload.data).decode() if f.payload.data else None,
            "payload_format": f.payload.format,
            "metadata": f.metadata,
            "tags": f.tags,
        }
    )


def _json_default(v):
    # Datetimes nested inside dataclasses reach here; isoformat keeps
    # every command's timestamp output parseable by one ISO-8601 parser
    # (str(datetime) uses a space separator).
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _result_json(res) -> str:
    return json.dumps(
        {"result": type(res).__name__, **{
            k: (v.isoformat() if hasattr(v, "isoformat") else
                list(v) if isinstance(v, tuple) else
                dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v)
            for k, v in (dataclasses.asdict(res) if dataclasses.is_dataclass(res) else {}).items()
        }},
        default=_json_default,
    )


def _parse_tags(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def _positive_int(raw: str) -> int:
    """argparse type: reject bad limits BEFORE the ~35 s Spark startup
    (the engine's validate_limit would raise a raw traceback after)."""
    n = int(raw)
    if n <= 0:
        raise argparse.ArgumentTypeError("must be > 0")
    return n


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="factstore_spark")
    ap.add_argument("--root", default=os.environ.get("FACTSTORE_ROOT", "./factstore-data"))
    ap.add_argument(
        "--backend",
        default=os.environ.get("FACTSTORE_BACKEND", "flock"),
        help="commit backend: flock (per-store lock), optimistic[+hardlink|+excl"
        "|+objstore://host:port/key] (lock-free claim-retry over a CAS substrate)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-stores")
    for name in ("create-store", "remove-store"):
        p = sub.add_parser(name)
        p.add_argument("store")

    p = sub.add_parser("append")
    p.add_argument("store")
    p.add_argument("--type", required=True)
    p.add_argument("--subject", required=True)
    p.add_argument("--payload", help="UTF-8 payload string")
    p.add_argument("--payload-format")
    p.add_argument("--tag", action="append", help="k=v, repeatable")
    p.add_argument("--meta", action="append", help="k=v, repeatable")
    p.add_argument("--idempotency-key")
    p.add_argument("--expect-last", help="subject=<factId|none> optimistic-concurrency condition")

    p = sub.add_parser("find-by-id")
    p.add_argument("store")
    p.add_argument("fact_id")

    p = sub.add_parser("find-by-subject")
    p.add_argument("store")
    p.add_argument("subject")
    p.add_argument("--limit", type=_positive_int)
    p.add_argument("--backward", action="store_true")

    p = sub.add_parser("find-by-tags")
    p.add_argument("store")
    p.add_argument("--tag", action="append", required=True)
    p.add_argument("--limit", type=_positive_int)
    p.add_argument("--backward", action="store_true")

    p = sub.add_parser("replay")
    p.add_argument("store")
    p.add_argument("--after", help="fact id cursor")
    p.add_argument("--batch-size", type=int, default=10_000)

    p = sub.add_parser("ingest-jsonl")
    p.add_argument("store")
    p.add_argument("path")

    p = sub.add_parser("export-jsonl")
    p.add_argument("store")
    p.add_argument("path")

    p = sub.add_parser("serve", help="run the embedded REST/SSE server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)

    p = sub.add_parser("serve-rpc", help="run the gRPC-parity wire server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=50051)

    args = ap.parse_args(argv)

    from .model import (
        ExpectedLastFact,
        FactInput,
        FactPayload,
        NoCondition,
        ReadDirection,
        ReplayStart,
    )
    from .results import FactsFound
    from .session import get_spark
    from .store import FactStore

    spark = get_spark(app_name="factstore-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        fs = FactStore(spark, args.root, commit_backend=args.backend)
    except ValueError as e:
        ap.error(str(e))  # e.g. unknown --backend: clean exit, not a traceback
    direction = (
        ReadDirection.BACKWARD if getattr(args, "backward", False) else ReadDirection.FORWARD
    )

    if args.cmd == "list-stores":
        for m in fs.list_all():
            print(json.dumps({"id": m.id, "name": m.name, "created_at": m.created_at.isoformat()}))
    elif args.cmd == "create-store":
        print(_result_json(fs.create(args.store)))
    elif args.cmd == "remove-store":
        print(_result_json(fs.remove(args.store)))
    elif args.cmd == "append":
        cond = NoCondition()
        if args.expect_last:
            subj, _, fid = args.expect_last.partition("=")
            cond = ExpectedLastFact(subj, None if fid in ("", "none") else fid)
        fi = FactInput(
            type=args.type,
            subject=args.subject,
            payload=FactPayload(
                (args.payload or "").encode(), format=args.payload_format
            ),
            metadata=_parse_tags(args.meta),
            tags=_parse_tags(args.tag),
        )
        print(_result_json(fs.append(args.store, fi, condition=cond,
                                     idempotency_key=args.idempotency_key)))
    elif args.cmd == "find-by-id":
        res = fs.find_by_id(args.store, args.fact_id)
        print(_fact_json(res.fact) if hasattr(res, "fact") else _result_json(res))
    elif args.cmd == "find-by-subject":
        res = fs.find_by_subject(args.store, args.subject, limit=args.limit, direction=direction)
        if isinstance(res, FactsFound):
            for f in res.facts:
                print(_fact_json(f))
        else:
            print(_result_json(res))
    elif args.cmd == "find-by-tags":
        res = fs.find_by_tags(args.store, _parse_tags(args.tag), limit=args.limit, direction=direction)
        if isinstance(res, FactsFound):
            for f in res.facts:
                print(_fact_json(f))
        else:
            print(_result_json(res))
    elif args.cmd == "replay":
        start = ReplayStart.After(args.after) if args.after else ReplayStart.Beginning()
        res = fs.replay(args.store, start, batch_size=args.batch_size)
        if hasattr(res, "__iter__"):
            for batch in res:
                for f in batch:
                    print(_fact_json(f))
        else:
            print(_result_json(res))
    elif args.cmd == "ingest-jsonl":
        from .sources.jsonl import read_fact_inputs_jsonl

        df = read_fact_inputs_jsonl(spark, args.path)
        print(_result_json(fs.append_dataframe(args.store, df)))
    elif args.cmd == "export-jsonl":
        from .sources.jsonl import write_facts_jsonl

        df = fs.facts_df(args.store)
        if df is None:
            print(json.dumps({"result": "StoreNotFound", "name": args.store}))
            spark.stop()
            return 1
        write_facts_jsonl(df, args.path)
        print(json.dumps({"result": "Exported", "path": args.path}))
    elif args.cmd == "serve":
        from .server import FactStoreServer

        srv = FactStoreServer(fs, host=args.host, port=args.port).start()
        print(json.dumps({"serving": "rest", "host": args.host, "port": srv.port}), flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.stop()
    elif args.cmd == "serve-rpc":
        from .rpc import RpcServer

        srv = RpcServer(fs, host=args.host, port=args.port).start()
        print(json.dumps({"serving": "rpc", "host": srv.host, "port": srv.port}), flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.stop()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
