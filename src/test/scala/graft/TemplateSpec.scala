package graft

import graft.ops.TemplateCompiler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FreeMarker-subset template compiler: interpolation, builtins,
  * <#if>/<#elseif>/<#else>, <#list>, compiled to Columns. */
class TemplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def render(tmpl: String, df: org.apache.spark.sql.DataFrame) =
    df.select(TemplateCompiler.compile(tmpl, df.schema).as("t"))
      .collect().map(_.getString(0)).toSeq

  lazy val df = Seq(
    (1L, "alice", 30.0, Seq("a", "b"), "F"),
    (2L, "bob", 15.0, Seq.empty[String], null)
  ).toDF("id", "name", "score", "tags", "returnflag")

  test("plain interpolation and null-to-empty behave as before") {
    assert(render("id=${id} name=${name?upper_case}", df) ===
      Seq("id=1 name=ALICE", "id=2 name=BOB"))
    assert(render("[${returnflag}]", df) === Seq("[F]", "[]"))
  }

  test("if / elseif / else compiles to when chains") {
    val t = "<#if score gt 20>high<#elseif score gt 10>mid<#else>low</#if>"
    assert(render(t, df) === Seq("high", "mid"))
    // symbolic ops, string compare, && / || / ! and parens
    val t2 = "<#if (name == \"alice\" && score >= 30) || !(id < 2)>Y<#else>N</#if>"
    assert(render(t2, df) === Seq("Y", "Y"))
    val t3 = "<#if name == \"bob\">B</#if>!"
    assert(render(t3, df) === Seq("!", "B!"))
  }

  test("?? presence guard") {
    assert(render("<#if returnflag??>${returnflag}<#else>-</#if>", df) ===
      Seq("F", "-"))
  }

  test("list renders array elements through transform+array_join") {
    assert(render("<#list tags as t>[${t?upper_case}]</#list>", df) ===
      Seq("[A][B]", ""))
  }

  test("null array in <#list> renders empty, not a null template") {
    val d = Seq((1L, Seq("a")), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "tags")
    assert(render("id=${id}<#list tags as t>[${t}]</#list>", d) ===
      Seq("id=1[a]", "id=2"))
  }

  test("nested if inside list; loop var shadows columns") {
    val t = "<#list tags as x><#if x == \"a\">first<#else>:${x}</#if></#list>"
    assert(render(t, df) === Seq("first:b", ""))
  }

  test("referencedFields sees condition and list refs, not loop vars") {
    val fs = TemplateCompiler.referencedFields(
      "<#if returnflag??>${id}</#if><#list tags as t>${t}:${name}</#list>")
    assert(fs.toSet === Set("returnflag", "id", "tags", "name"))
  }

  test("ref-vs-ref comparison and field-to-field conditions") {
    val d2 = Seq((5.0, 3.0), (1.0, 4.0)).toDF("a", "b")
    assert(render("<#if a gt b>A<#else>B</#if>", d2) === Seq("A", "B"))
  }

  test("?string(fmt) date formatting") {
    val d = Seq(java.sql.Timestamp.valueOf("2024-03-04 05:06:07"))
      .toDF("ts")
    assert(render("${ts?string(\"yyyy/MM/dd\")}", d) === Seq("2024/03/04"))
  }

  test("unsupported constructs raise at compile time") {
    val e = intercept[IllegalArgumentException] {
      TemplateCompiler.compile("${a + b}", df.schema)
    }
    assert(e.getMessage.contains("interpolation"))
    val e2 = intercept[IllegalArgumentException] {
      TemplateCompiler.compile("<#assign x=1>", df.schema)
    }
    assert(e2.getMessage.contains("unsupported directive"))
    val e3 = intercept[IllegalArgumentException] {
      TemplateCompiler.compile("<#if a gt 1>x", df.schema)
    }
    assert(e3.getMessage.contains("unterminated"))
  }
}
