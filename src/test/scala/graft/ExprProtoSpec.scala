package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.proto.ExprProto
import graft.shell.Shell

/** Proto3 wire round-trip of shell expressions — the expression corpus is
  * the reference's shell parser golden set (api/shell_test.go:36-340), so
  * the NodeProto trees exercised here are the ones the gRPC entry point
  * actually carries (grpc/service.go:26-90). */
class ExprProtoSpec extends AnyFunSuite {

  // expressions lifted from api/shell_test.go (LiteralInt, LiteralFloat,
  // LiteralLatLng, LiteralTag, LiteralSearchableTagWithToken,
  // LiteralTagWithQuotes, SimpleCall, Pipeline2Stages, Group, FeatureID,
  // NestedGroups, ExplicitLambdaWithArg + query literals)
  val corpus: Seq[String] = Seq(
    "42",
    "42.0",
    "19.4008, -99.1663",
    "#highway=path",
    "#nhs:hospital=yes",
    "name=\"The Lighterman\"",
    "find-feature /n/6082053666",
    "find \"highway=primary\" | highlight",
    "find (intersecting 19.4008, -99.1663)",
    "pair 55.614929, -2.8048709 /area/openstreetmap.org/way/115912092",
    "find (intersecting (find-area /area/openstreetmap.org/way/115912092))",
    "map {f -> tag f \"name\"} (all-areas)",
    "find [#amenity=cafe & @name]",
    "find [#building | #amenity=restaurant]",
    "count (find [#amenity=cafe])",
  )

  test("NodeProto round-trip is AST-exact and byte-exact for the shell_test.go corpus") {
    assert(corpus.size >= 10)
    corpus.foreach { src =>
      val ast = Shell.parse(src)
      val bytes = ExprProto.encode(ast)
      val back = ExprProto.decode(bytes)
      assert(back == ast, s"AST round-trip failed for: $src\n  got $back\n  want $ast")
      val bytes2 = ExprProto.encode(back)
      assert(java.util.Arrays.equals(bytes, bytes2),
        s"re-encode not byte-exact for: $src")
    }
  }

  test("oneof arms at zero values survive the round trip") {
    val zeros: Seq[Shell.Expr] = Seq(
      Shell.IntE(0), // intValue 0 must still mark the oneof arm
      Shell.FloatE(0.0),
      Shell.StringE(""),
      Shell.IntE(-42), // negative int64: 10-byte varint
      Shell.FloatE(-1.5),
      Shell.LatLngE(0.0, -99.1663))
    zeros.foreach { ast =>
      val bytes = ExprProto.encode(ast)
      val back = ExprProto.decode(bytes)
      assert(back == ast, s"zero-value round-trip failed: $ast -> $back")
      assert(java.util.Arrays.equals(bytes, ExprProto.encode(back)))
    }
  }

  test("wire layout spot-check: varints, keys and doubles match the proto3 spec") {
    // NodeProto{symbol: "go"} = field 1, wire 2, len 2, 'g','o'
    assert(ExprProto.encode(Shell.SymbolE("go")).toSeq ==
      Seq[Byte](0x0a, 0x02, 'g'.toByte, 'o'.toByte))
    // NodeProto{literal{intValue: 300}} = 0x12 len [0x20 varint(300)]
    assert(ExprProto.encode(Shell.IntE(300)).toSeq ==
      Seq[Byte](0x12, 0x03, 0x20, 0xac.toByte, 0x02))
    // double 1.0 is 8 LE bytes 00..f0 3f under field 5 wire 1 (0x29)
    assert(ExprProto.encode(Shell.FloatE(1.0)).toSeq ==
      Seq[Byte](0x12, 0x09, 0x29, 0, 0, 0, 0, 0, 0, 0xf0.toByte, 0x3f))
  }
}
