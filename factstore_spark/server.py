"""Embedded REST adapter — the reference's HTTP surface
(factstore-server/.../http/) over the Spark engine, stdlib-only.

Wire contract mirrors api.kt / the resource paths:

    POST   /v1/stores                          {"name": ...}
    GET    /v1/stores
    GET    /v1/stores/{name}
    DELETE /v1/stores/{name}
    POST   /v1/stores/{s}/facts                AppendHttpRequest (api.kt:12-17;
                                               polymorphic conditions api.kt:35-75,
                                               payload.data base64)
    GET    /v1/stores/{s}/facts/{factId}
    POST   /v1/stores/{s}/facts/query          {"queryItems": [...]} (tagOnly/tagType)
    GET    /v1/stores/{s}/subjects/{subj}/facts?limit=&direction=
    GET    /v1/stores/{s}/facts?from=&to=&tag=k=v&limit=&direction=
    GET    /v1/stores/{s}/facts/replay?after=
    GET    /v1/stores/{s}/facts/subscribe?start=beginning|end&after=&watch=1 (SSE)

Result mapping keeps the zero-exception policy observable: expected
outcomes are status codes + JSON bodies (409 for NameAlreadyExists and
AppendConditionViolated; 200 empty body for AlreadyApplied, matching
extensions.kt:24-29; 404 for StoreNotFound/FactNotFound)."""

from __future__ import annotations

import base64
import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from .model import (
    AllConditions,
    ExpectedLastFact,
    FactInput,
    FactPayload,
    NoCondition,
    ReadDirection,
    ReplayStart,
    StartPosition,
    TagOnlyQueryItem,
    TagQuery,
    TagQueryBased,
    TagTypeItem,
    TimeRange,
)
from .results import (
    AlreadyApplied,
    Appended,
    AppendConditionViolated,
    FactFound,
    FactIdNotFound,
    FactsFound,
    StoreCreated,
    StoreNameAlreadyExists,
    StoreNotFound,
    StoreRemoved,
)


EXPLORER_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>factstore explorer</title>
<style>
:root{--bg:#fff;--fg:#111;--line:#ddd;--panel:#f5f5f5;--sel:#eef}
@media (prefers-color-scheme: dark){
 :root{--bg:#16181d;--fg:#e8e8e8;--line:#3a3d44;--panel:#22252b;--sel:#2b3040}}
body{font:14px/1.45 system-ui,sans-serif;margin:0;display:flex;height:100vh;
 background:var(--bg);color:var(--fg)}
#side{width:230px;border-right:1px solid var(--line);padding:12px;overflow:auto}
#main{flex:1;padding:12px;overflow:auto}
h1{font-size:16px;margin:0 0 10px}
li{cursor:pointer;padding:3px 6px;border-radius:4px;list-style:none;display:flex;
 justify-content:space-between;align-items:center}
li:hover,li.sel{background:var(--sel)}
li .del{visibility:hidden;color:#c33;border:none;background:none;cursor:pointer}
li:hover .del{visibility:visible}
ul{padding:0;margin:0}
table{border-collapse:collapse;width:100%;margin-top:10px;font-size:12px}
td,th{border:1px solid var(--line);padding:4px 6px;text-align:left;vertical-align:top}
th{background:var(--panel)}
input,select,button{font:inherit;padding:3px 6px;margin-right:6px;
 background:var(--bg);color:var(--fg);border:1px solid var(--line);border-radius:4px}
#live{color:#0a0}
#detail{white-space:pre-wrap;background:var(--panel);padding:8px;border-radius:4px;
 margin-top:10px;display:none;font:12px/1.4 ui-monospace,monospace}
tr{cursor:pointer}
code{background:var(--panel);padding:1px 4px;border-radius:3px}
#range{display:none}
</style></head><body>
<div id="side"><h1>Stores</h1><ul id="stores"></ul>
 <p><input id="newname" placeholder="new store" size="12">
 <button onclick="createStore()">Create</button></p></div>
<div id="main">
  <h1 id="title">factstore explorer</h1>
  <div>
    <select id="mode" onchange="modeChanged()">
      <option value="subject">by subject</option>
      <option value="tags">by tags (k=v,k2=v2)</option>
      <option value="time">by time range</option>
      <option value="replay">replay</option>
    </select>
    <input id="q" placeholder="subject or tags">
    <span id="range"><input id="from" placeholder="from ISO" size="17">
      <input id="to" placeholder="to ISO" size="17"></span>
    <input id="limit" placeholder="limit" size="4">
    <select id="dir"><option value="">forward</option>
      <option value="backward">backward</option></select>
    <button onclick="run()">Find</button>
    <button onclick="tail()">Tail (SSE)</button> <span id="live"></span>
  </div>
  <table id="out"><thead><tr><th>position</th><th>type</th><th>subject</th>
  <th>appendedAt</th><th>tags</th><th>id</th></tr></thead><tbody></tbody></table>
  <div id="detail"></div>
</div>
<script>
let store=null,es=null;
async function loadStores(){
  const r=await fetch('/api/v1/stores');const stores=await r.json();
  const ul=document.getElementById('stores');ul.innerHTML='';
  for(const s of stores){const li=document.createElement('li');
    const span=document.createElement('span');span.textContent=s.name;
    const del=document.createElement('button');del.textContent='\u2715';del.className='del';
    del.title='delete store';
    del.onclick=async e=>{e.stopPropagation();
      if(!confirm('Delete store \''+s.name+'\' and every fact in it?'))return;
      await fetch('/api/v1/stores/'+encodeURIComponent(s.name),{method:'DELETE'});
      if(store===s.name){store=null;document.getElementById('title').textContent='factstore explorer';}
      loadStores();};
    li.appendChild(span);li.appendChild(del);
    li.onclick=()=>{store=s.name;document.getElementById('title').textContent=s.name;
      [...ul.children].forEach(c=>c.classList.remove('sel'));li.classList.add('sel');run();};
    ul.appendChild(li);}
}
async function createStore(){
  const name=document.getElementById('newname').value.trim();if(!name)return;
  const r=await fetch('/api/v1/stores',{method:'POST',
    headers:{'Content-Type':'application/json'},body:JSON.stringify({name})});
  if(!r.ok){const b=await r.json().catch(()=>({}));alert(b.error||('HTTP '+r.status));return;}
  document.getElementById('newname').value='';loadStores();
}
function modeChanged(){
  const m=document.getElementById('mode').value;
  document.getElementById('range').style.display=m==='time'?'inline':'none';
  document.getElementById('q').style.display=(m==='time'||m==='replay')?'none':'inline';
}
function render(facts){
  const tb=document.querySelector('#out tbody');tb.innerHTML='';
  for(const f of facts)addRow(f);
}
function addRow(f){
  const tb=document.querySelector('#out tbody');const tr=document.createElement('tr');
  const tags=Object.entries(f.tags||{}).map(([k,v])=>k+'='+v).join(', ');
  for(const v of [f.position,f.type,f.subject,f.appendedAt,tags,f.id]){
    const td=document.createElement('td');td.textContent=v??'';tr.appendChild(td);}
  tr.onclick=()=>showDetail(f);
  tb.appendChild(tr);
}
function showDetail(f){
  const d=document.getElementById('detail');
  let payload='';
  try{payload=atob((f.payload&&f.payload.data)||'');}catch(_){payload='<binary>';}
  d.textContent=JSON.stringify({...f,payloadDecoded:payload},null,2);
  d.style.display='block';
}
async function run(){
  if(!store)return;stopTail();
  document.getElementById('detail').style.display='none';
  const mode=document.getElementById('mode').value;
  const q=document.getElementById('q').value.trim();
  const lim=document.getElementById('limit').value.trim();
  const dir=document.getElementById('dir').value;
  let url;
  if(mode==='subject')url=`/api/v1/stores/${store}/subjects/${encodeURIComponent(q)}/facts`;
  else if(mode==='tags')url=`/api/v1/stores/${store}/facts?`+
    q.split(',').filter(Boolean).map(t=>'tag='+encodeURIComponent(t.trim())).join('&');
  else if(mode==='time'){
    const from=document.getElementById('from').value.trim();
    const to=document.getElementById('to').value.trim();
    const ps=[];if(from)ps.push('from='+encodeURIComponent(from));
    if(to)ps.push('to='+encodeURIComponent(to));
    url=`/api/v1/stores/${store}/facts`+(ps.length?'?'+ps.join('&'):'');
  }
  else url=`/api/v1/stores/${store}/facts/replay`;
  if(lim&&mode!=='replay')url+=(url.includes('?')?'&':'?')+'limit='+lim;
  if(dir&&mode!=='replay')url+=(url.includes('?')?'&':'?')+'direction='+dir;
  const r=await fetch(url);const body=await r.json().catch(()=>({}));
  if(!r.ok){alert(body.error||('HTTP '+r.status));render([]);return;}
  render(Array.isArray(body)?body:[]);
}
function stopTail(){if(es){es.close();es=null;document.getElementById('live').textContent='';}}
function tail(){
  if(!store)return;stopTail();
  document.querySelector('#out tbody').innerHTML='';
  es=new EventSource(`/api/v1/stores/${store}/facts/subscribe`);
  document.getElementById('live').textContent='live';
  es.onmessage=e=>{try{addRow(JSON.parse(e.data));}catch(_){}};
}
modeChanged();loadStores();
</script></body></html>
"""


def _fact_dict(f) -> dict:
    return {
        "id": f.id,
        "type": f.type,
        "subject": f.subject,
        "appendedAt": f.appended_at.isoformat(),
        "position": f.position,
        "payload": {
            "data": base64.b64encode(f.payload.data).decode(),
            "format": f.payload.format,
            "schemaRef": f.payload.schema_ref,
        },
        "metadata": f.metadata,
        "tags": f.tags,
    }


def _parse_condition(d) -> object:
    if d is None:
        return NoCondition()
    kind = d.get("type", "none")
    if kind == "none":
        return NoCondition()
    if kind == "expectedLastFact":
        return ExpectedLastFact(d["subject"], d.get("expectedLastFactId"))
    if kind == "all":
        return AllConditions([_parse_condition(c) for c in d["conditions"]])
    if kind == "tagQueryBased":
        return TagQueryBased(
            _parse_tag_query(d["failIfEventsMatch"]), d.get("after")
        )
    raise ValueError(f"unknown condition type: {kind}")


def _parse_tag_query(d) -> TagQuery:
    items = []
    for item in d["queryItems"]:
        if item.get("type") == "tagType":
            items.append(TagTypeItem(set(item["types"]), item["tags"]))
        else:
            items.append(TagOnlyQueryItem(item["tags"]))
    return TagQuery(items)


def _parse_direction(qs) -> ReadDirection:
    v = (qs.get("direction", ["forward"])[0] or "forward").lower()
    return ReadDirection.BACKWARD if v == "backward" else ReadDirection.FORWARD


def _parse_limit(qs):
    """limit <= 0 means unbounded at the HTTP layer — QueryResource.kt:108
    (`if (this != null && this > 0) Limit.of(this) else Limit.None`)."""
    raw = qs.get("limit", [None])[0]
    if raw in (None, ""):
        return None
    n = int(raw)
    return n if n > 0 else None


class FactStoreHandler(BaseHTTPRequestHandler):
    fs = None  # injected by serve()
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):  # quiet
        pass

    # -- helpers ---------------------------------------------------------

    def _json(self, code: int, body=None) -> None:
        data = b"" if body is None else json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length", "0"))
        return json.loads(self.rfile.read(n) or b"{}")

    def _segments(self):
        parsed = urlparse(self.path)
        parts = [unquote(p) for p in parsed.path.split("/") if p]
        if parts and parts[0] == "api":
            parts = parts[1:]
        return parts, parse_qs(parsed.query)

    def _facts_response(self, res) -> None:
        if isinstance(res, StoreNotFound):
            self._json(404, {"error": "store not found", "name": res.name})
        elif isinstance(res, FactsFound):
            self._json(200, [_fact_dict(f) for f in res.facts])
        else:
            self._json(500, {"error": str(res)})

    # -- routing ---------------------------------------------------------

    def do_POST(self):
        parts, _qs = self._segments()
        try:
            if parts == ["v1", "stores"]:
                body = self._read_body()
                res = self.fs.create(body["name"])
                if isinstance(res, StoreCreated):
                    m = res.metadata
                    self._json(201, {"id": m.id, "name": m.name, "createdAt": m.created_at.isoformat()})
                elif isinstance(res, StoreNameAlreadyExists):
                    self._json(409, {"error": "store name already exists"})
                return
            if len(parts) == 4 and parts[:2] == ["v1", "stores"] and parts[3] == "facts":
                body = self._read_body()
                facts = []
                for f in body["facts"]:
                    data = base64.b64decode(f.get("payload", {}).get("data", "") or "")
                    if not data:
                        # HTTP-layer parity: FactPayloadHttp.data is
                        # @NotEmpty (api.kt:120-123). The engine itself
                        # allows empty payloads (spec-level opacity).
                        self._json(400, {"error": "payload data must not be empty"})
                        return
                    facts.append(
                        FactInput(
                            type=f["type"],
                            subject=f["subject"],
                            payload=FactPayload(
                                data,
                                format=f.get("payload", {}).get("format"),
                                schema_ref=f.get("payload", {}).get("schemaRef"),
                            ),
                            metadata=f.get("metadata") or {},
                            tags=f.get("tags") or {},
                        )
                    )
                res = self.fs.append(
                    parts[2],
                    facts,
                    condition=_parse_condition(body.get("condition")),
                    idempotency_key=body.get("idempotencyKey"),
                )
                if isinstance(res, Appended):
                    self._json(200, {"factIds": list(res.fact_ids), "appendedAt": res.appended_at.isoformat()})
                elif isinstance(res, AlreadyApplied):
                    self._json(200)  # empty body, extensions.kt:24-29
                elif isinstance(res, AppendConditionViolated):
                    self._json(409, {"error": "append condition violated", "reason": res.reason})
                elif isinstance(res, StoreNotFound):
                    self._json(404, {"error": "store not found"})
                return
            if len(parts) == 5 and parts[:2] == ["v1", "stores"] and parts[3] == "facts" and parts[4] == "query":
                query = _parse_tag_query(self._read_body())
                self._facts_response(self.fs.find_by_tag_query(parts[2], query))
                return
            self._json(404, {"error": "no such route"})
        except (KeyError, ValueError, TypeError, AttributeError, json.JSONDecodeError) as e:
            self._json(400, {"error": str(e)})

    def do_GET(self):
        parts, qs = self._segments()
        try:
            if parts in ([], ["explorer"]):
                # factstore-explorer analog: a single self-contained
                # page over the REST surface (list stores, run finders,
                # tail the SSE subscription) — no build step, no deps.
                body = EXPLORER_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parts == ["v1", "info"]:
                # InfoResource analog (factstore-server/.../http/InfoResource.kt)
                from . import __version__

                self._json(200, {"name": "factstore-spark", "version": __version__})
                return
            if parts == ["v1", "stores"]:
                self._json(200, [
                    {"id": m.id, "name": m.name, "createdAt": m.created_at.isoformat()}
                    for m in self.fs.list_all()
                ])
                return
            if len(parts) == 3 and parts[:2] == ["v1", "stores"]:
                m = self.fs.find_by_name(parts[2])
                if m is None:
                    self._json(404, {"error": "store not found"})
                else:
                    self._json(200, {"id": m.id, "name": m.name, "createdAt": m.created_at.isoformat()})
                return
            if len(parts) == 5 and parts[:2] == ["v1", "stores"] and parts[3] == "facts" and parts[4] == "subscribe":
                self._subscribe(parts[2], qs)
                return
            if len(parts) == 5 and parts[:2] == ["v1", "stores"] and parts[3] == "facts" and parts[4] == "replay":
                after = qs.get("after", [None])[0]
                start = ReplayStart.After(after) if after else ReplayStart.Beginning()
                res = self.fs.replay(parts[2], start)
                if isinstance(res, StoreNotFound):
                    self._json(404, {"error": "store not found"})
                elif isinstance(res, FactIdNotFound):
                    self._json(404, {"error": "fact id not found", "factId": res.fact_id})
                else:
                    # STREAM the batched replay instead of flattening it
                    # into one list + one json.dumps: the engine's replay
                    # is deliberately a bounded-batch generator, and a
                    # multi-million-fact store would otherwise sit in
                    # driver RAM twice (dicts + serialized body). Close-
                    # delimited JSON array (no Content-Length).
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Connection", "close")
                    self.end_headers()
                    # Once headers are out, a mid-stream failure must NOT
                    # fall through to do_GET's outer handler — its
                    # _json(400, ...) would write a second status line
                    # into the open close-delimited body, corrupting it.
                    # Log and drop the connection instead: the truncated
                    # (unterminated) array is the client's failure signal.
                    try:
                        self.wfile.write(b"[")
                        first = True
                        for batch in res:
                            for f in batch:
                                if not first:
                                    self.wfile.write(b",")
                                self.wfile.write(json.dumps(_fact_dict(f)).encode())
                                first = False
                            self.wfile.flush()
                        self.wfile.write(b"]")
                    except Exception as exc:  # noqa: BLE001
                        self.log_error("replay stream aborted mid-body: %r", exc)
                    self.close_connection = True
                return
            if len(parts) == 5 and parts[:2] == ["v1", "stores"] and parts[3] == "facts":
                res = self.fs.find_by_id(parts[2], parts[4])
                if isinstance(res, FactFound):
                    self._json(200, _fact_dict(res.fact))
                else:
                    self._json(404, {"error": type(res).__name__})
                return
            if len(parts) == 6 and parts[:2] == ["v1", "stores"] and parts[3] == "subjects" and parts[5] == "facts":
                res = self.fs.find_by_subject(
                    parts[2], parts[4], limit=_parse_limit(qs), direction=_parse_direction(qs)
                )
                self._facts_response(res)
                return
            if len(parts) == 4 and parts[:2] == ["v1", "stores"] and parts[3] == "facts":
                tags = dict(t.split("=", 1) if "=" in t else (t, "") for t in qs.get("tag", []))
                if tags:
                    if qs.get("from") or qs.get("to"):
                        # The finder surface has no combined tags+time
                        # operator (SURVEY §2.3) — refuse loudly rather
                        # than silently dropping the time bounds.
                        self._json(400, {"error": "tag and from/to filters cannot be combined"})
                        return
                    res = self.fs.find_by_tags(
                        parts[2], tags, limit=_parse_limit(qs), direction=_parse_direction(qs)
                    )
                else:
                    tr = TimeRange(
                        start=_parse_instant(qs.get("from", [None])[0]),
                        end=_parse_instant(qs.get("to", [None])[0]),
                    )
                    res = self.fs.find_in_time_range(
                        parts[2], tr, limit=_parse_limit(qs), direction=_parse_direction(qs)
                    )
                self._facts_response(res)
                return
            self._json(404, {"error": "no such route"})
        except (KeyError, ValueError, TypeError, AttributeError) as e:
            self._json(400, {"error": str(e)})

    def do_DELETE(self):
        try:
            parts, _qs = self._segments()
            if len(parts) == 3 and parts[:2] == ["v1", "stores"]:
                res = self.fs.remove(parts[2])
                if isinstance(res, StoreRemoved):
                    self._json(204)
                else:
                    self._json(404, {"error": "store not found"})
                return
            self._json(404, {"error": "no such route"})
        except (KeyError, ValueError, TypeError, AttributeError, OSError) as e:
            # same guard as do_GET/do_POST — an engine error (e.g. an
            # rmtree OSError under a concurrent reader) must yield an
            # HTTP response, not a bare connection reset
            self._json(400, {"error": str(e)})

    # -- SSE subscription (StreamResource.kt:23-39 analog) ---------------

    def _subscribe(self, store: str, qs) -> None:
        after = qs.get("after", [None])[0]
        start_kind = qs.get("start", ["beginning"])[0]
        if after:
            start = StartPosition.After(after)
        elif start_kind == "end":
            start = StartPosition.End()
        else:
            start = StartPosition.Beginning()
        # keepalive: on a quiet store the generator yields an empty
        # batch every 10 s, which becomes an SSE comment write — the
        # only way a dead socket ever surfaces (BrokenPipeError) so an
        # abandoned subscription doesn't leak its thread + poll loop
        # until process exit.
        # watch=1|true: commit-log change-token wakeup — single-digit-ms
        # idle-tail delivery at the same 100 ms poll fallback (the FDB
        # head-key watch analog; see FactStore.subscribe).
        watch = qs.get("watch", ["0"])[0].lower() in ("1", "true")
        gen = self.fs.subscribe(
            store, start, poll_interval=0.1, keepalive_every=10.0,
            watch=watch,
        )
        if isinstance(gen, StoreNotFound):
            self._json(404, {"error": "store not found"})
            return
        if isinstance(gen, FactIdNotFound):
            self._json(404, {"error": "fact id not found"})
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()
        try:
            for batch in gen:
                if not batch:
                    self.wfile.write(b": ping\n\n")
                    self.wfile.flush()
                    continue
                for f in batch:
                    payload = json.dumps(_fact_dict(f))
                    self.wfile.write(f"data: {payload}\n\n".encode())
                self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            return  # client went away — the flow is infinite by contract
        except Exception as exc:  # noqa: BLE001
            # Same rule as the replay stream: once headers are out, a
            # mid-stream engine error (e.g. ArrowInvalid, a ValueError
            # subclass that would otherwise fall through to do_GET's
            # handler) must NOT write a second status line into the
            # open event stream — log and drop the connection.
            self.log_error("subscribe stream aborted mid-body: %r", exc)
            self.close_connection = True


def _parse_instant(raw):
    """Same normalization as rpc.py: accept Z suffix, interpret bare
    (naive) stamps as UTC so from/to bounds never mix aware and naive
    (the TypeError class of 500s)."""
    if not raw:
        return None
    ts = datetime.fromisoformat(raw.replace("Z", "+00:00"))
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts


class FactStoreServer:
    """In-process server: ``serve(fs, port=0)`` returns (server, port).
    Threaded so SSE subscriptions don't block other requests."""

    def __init__(self, fact_store, host: str = "127.0.0.1", port: int = 0):
        handler = type("BoundHandler", (FactStoreHandler,), {"fs": fact_store})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._thread = None

    def start(self) -> "FactStoreServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
