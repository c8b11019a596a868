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
import urllib.parse
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

    def evaluate_proto(self, node_bytes, world=None):
        """POST a raw NodeProto frame (see proto_node/proto_call below) --
        the gRPC payload of the reference (expression.py builds the same
        trees), re-framed over HTTP."""
        query = "?version=" + self.version
        if world is not None:
            query += "&world=" + urllib.parse.quote(world)
        req = urllib.request.Request(
            self.base + "/evaluate-proto" + query,
            data=node_bytes,
            headers={"Content-Type": "application/x-protobuf"})
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


# ---- proto3 NodeProto builders (api.proto:106-149; wire format is the
# ---- public proto3 spec: varints + length-delimited submessages) ----------

def _varint(v):
    out = bytearray()
    v &= (1 << 64) - 1  # int64 two's-complement on the wire
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _len_field(num, payload):
    return _field(num, 2, _varint(len(payload)) + payload)


def proto_symbol(name):
    """NodeProto{symbol: name}"""
    return _len_field(1, name.encode("utf-8"))


def proto_string(value):
    """NodeProto{literal{stringValue}}"""
    return _len_field(2, _len_field(3, value.encode("utf-8")))


def proto_int(value):
    """NodeProto{literal{intValue}} (always emitted: oneof arm)"""
    return _len_field(2, _field(4, 0, _varint(value)))


def proto_query_keyed(key):
    """NodeProto{literal{queryValue{keyed}}} (api.proto:184-202)"""
    return _len_field(2, _len_field(9, _len_field(3, key.encode("utf-8"))))


def proto_call(function_node, args, pipelined=False):
    """NodeProto{call{function, args..., pipelined}}"""
    body = _len_field(1, function_node)
    for a in args:
        body += _len_field(2, a)
    if pipelined:
        body += _field(3, 0, _varint(1))
    return _len_field(3, body)


def connect_insecure(address):
    if not address.startswith("http"):
        address = "http://" + address
    return Connection(address)
