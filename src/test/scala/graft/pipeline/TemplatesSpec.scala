package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class TemplatesSpec extends AnyFunSuite {

  test("plain variable substitution") {
    assert(Templates.render("where n >= {{.START}} and n <= {{.END}}",
      Map("START" -> "0", "END" -> "99")) == "where n >= 0 and n <= 99")
  }

  test("default fallback, quoted and bare") {
    assert(Templates.render("""host('{{.HOST | default "localhost"}}')""",
      Map.empty) == "host('localhost')")
    assert(Templates.render("""port({{.PORT | default 9000}})""",
      Map.empty) == "port(9000)")
    assert(Templates.render("""host('{{.HOST | default "x"}}')""",
      Map("HOST" -> "db1")) == "host('db1')")
  }

  test("missing var without default renders empty") {
    assert(Templates.render("a{{.NOPE}}b", Map.empty) == "ab")
  }

  test("if-blocks: truthy keeps body, falsy drops it") {
    val t = "select a{{ if .ENABLE_DENCUN }}, blob_gas{{ end }} from t"
    assert(Templates.render(t, Map("ENABLE_DENCUN" -> "true")) ==
      "select a, blob_gas from t")
    assert(Templates.render(t, Map.empty) == "select a from t")
    assert(Templates.render(t, Map("ENABLE_DENCUN" -> "false")) ==
      "select a from t")
  }

  test("renders a real reference-shaped template") {
    val t = """create temporary table buffer_{{.START}}_{{.END}}
              |as (select * from source
              |where block_number >= {{.START}} and block_number <= {{.END}})""".stripMargin
    val out = Templates.render(t, Map("START" -> "100", "END" -> "199"))
    assert(out.contains("buffer_100_199"))
    assert(out.contains("block_number >= 100 and block_number <= 199"))
  }

  test("env vars: AGN_ prefix stripped") {
    val vars = Templates.envVars(Map("AGN_RPC_ENDPOINT" -> "http://x", "PATH" -> "/bin"))
    assert(vars == Map("RPC_ENDPOINT" -> "http://x"))
  }
}
