"""Minimal python client for the graft evaluate service -- the analogue of
the reference's python/diagonal_b6 package (expression.py:7-60), speaking the
engine's JSON/HTTP evaluation boundary instead of gRPC/protobuf (no
third-party deps: stdlib urllib only).

Usage:
    conn = graft_b6.connect_insecure("127.0.0.1:8001")
    count = conn("find [#building] | count")          # -> 13
    rows  = conn("find [#building] | take 2")          # -> list of dicts
    fns   = conn.functions()                           # -> stub manifest
"""
import json
import urllib.request


class Connection:
    def __init__(self, base, version="1"):
        self.base = base.rstrip("/")
        self.version = version
        # client-stub generation: one attribute per registered function,
        # bound to a pipeline-builder (the b6-api --functions analogue)
        self._functions = None

    def functions(self):
        if self._functions is None:
            with urllib.request.urlopen(self.base + "/functions") as r:
                self._functions = json.load(r)
        return self._functions

    def evaluate(self, expression, world=None):
        body = {"expression": expression, "version": self.version}
        if world is not None:
            body["world"] = world
        req = urllib.request.Request(
            self.base + "/evaluate",
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                out = json.load(r)
        except urllib.error.HTTPError as e:
            raise RuntimeError(json.loads(e.read()).get("error", str(e)))
        kind, result = out["type"], out["result"]
        if kind == "long":
            return int(result)
        if kind == "double":
            return float(result)
        return result

    # calling the connection evaluates, like diagonal_b6.Connection
    __call__ = evaluate


def connect_insecure(address):
    if not address.startswith("http"):
        address = "http://" + address
    return Connection(address)
