package graft

import graft.schema.SchemaExpr
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaExprSpec extends AnyFunSuite {

  test("simple types") {
    assert(SchemaExpr.parse("a:int,b:str") ===
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(SchemaExpr.parse("a:long,b:double,c:bool,d:bytes,e:date,f:datetime") ===
      StructType(Seq(
        StructField("a", LongType), StructField("b", DoubleType),
        StructField("c", BooleanType), StructField("d", BinaryType),
        StructField("e", DateType), StructField("f", TimestampType))))
  }

  test("aliases and widths") {
    assert(SchemaExpr.parseType("int8") === ByteType)
    assert(SchemaExpr.parseType("int16") === ShortType)
    assert(SchemaExpr.parseType("int32") === IntegerType)
    assert(SchemaExpr.parseType("int64") === LongType)
    assert(SchemaExpr.parseType("float32") === FloatType)
    assert(SchemaExpr.parseType("float64") === DoubleType)
    assert(SchemaExpr.parseType("decimal(12,3)") === DecimalType(12, 3))
  }

  test("nested: list, struct, map, deep") {
    assert(SchemaExpr.parse("a:[int]") ===
      StructType(Seq(StructField("a", ArrayType(IntegerType)))))
    assert(SchemaExpr.parse("a:{x:long,y:str}") ===
      StructType(Seq(StructField("a",
        StructType(Seq(StructField("x", LongType), StructField("y", StringType)))))))
    assert(SchemaExpr.parse("a:<str,int>") ===
      StructType(Seq(StructField("a", MapType(StringType, IntegerType)))))
    assert(SchemaExpr.parse("a:[{x:[int],m:<str,[double]>}]").fields.head.dataType
      .isInstanceOf[ArrayType])
  }

  test("whitespace tolerance and backtick names") {
    assert(SchemaExpr.parse(" a : int , b : str ") === SchemaExpr.parse("a:int,b:str"))
    val st = SchemaExpr.parse("`a b`:int,`🐶`:str")
    assert(st.fieldNames.toSeq === Seq("a b", "🐶"))
  }

  test("render round-trips") {
    val exprs = Seq("a:int,b:str", "a:[long]", "a:{x:int,y:[str]}", "a:<str,double>",
      "a:decimal(10,2),b:bytes,c:datetime")
    exprs.foreach { e =>
      val st = SchemaExpr.parse(e)
      assert(SchemaExpr.parse(SchemaExpr.render(st)) === st, s"round-trip of $e")
    }
  }

  test("render quotes non-identifier names; quoted round-trip holds") {
    for (e <- Seq("`a b`:int", "`a.b`:[str]", "`a,b`:int,c:str")) {
      val st = SchemaExpr.parse(e)
      assert(SchemaExpr.parse(SchemaExpr.render(st)) === st, s"round-trip of $e")
    }
    // a backtick inside a name is not representable — clear error, not
    // silent corruption
    val bad = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a`b",
        org.apache.spark.sql.types.IntegerType)))
    intercept[IllegalArgumentException](SchemaExpr.render(bad))
  }

  test("wildcard hints against input schema") {
    val input = SchemaExpr.parse("a:int,b:str,c:double")
    assert(SchemaExpr.applyHint(input, "*") === input)
    assert(SchemaExpr.applyHint(input, "*,d:long") ===
      SchemaExpr.parse("a:int,b:str,c:double,d:long"))
    assert(SchemaExpr.applyHint(input, "*,+d:long") ===
      SchemaExpr.parse("a:int,b:str,c:double,d:long"))
    assert(SchemaExpr.applyHint(input, "*,-b") === SchemaExpr.parse("a:int,c:double"))
    assert(SchemaExpr.applyHint(input, "x:str") === SchemaExpr.parse("x:str"))
  }

  test("errors") {
    intercept[IllegalArgumentException](SchemaExpr.parse("a:unknown_type"))
    intercept[IllegalArgumentException](SchemaExpr.parse("a:int,"))
  }

  test("property: parse(render(s)) == s for random schemas (seeded)") {
    val rnd = new scala.util.Random(42)
    val types = Seq("int", "long", "double", "str", "bool", "bytes", "date",
      "datetime", "[int]", "[[str]]", "{x:int,y:[double]}", "<str,long>",
      "<str,{a:int}>", "decimal(10,2)")
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(8)
      val expr = (0 until n)
        .map(i => s"f$i:${types(rnd.nextInt(types.length))}").mkString(",")
      val st = SchemaExpr.parse(expr)
      assert(SchemaExpr.parse(SchemaExpr.render(st)) === st, expr)
    }
  }
}
