package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** SQL template loading + rendering — the reference's template layer
  * (internal/utils/utils.go:77-106: every `*.sql` under the pipeline dir;
  * `missingkey=default`; sprig `default`), covering the corpus idioms:
  *
  *   {{.START}}                               plain variable
  *   {{.RPC_ENDPOINT | default "http://x"}}   default fallback
  *   {{ if .ENABLE_DENCUN }} … {{ end }}      conditional block
  *     (examples/ethereum_transactions/create_buffer.sql:52-61)
  *
  * Vars come from explicit bindings plus AGN_*-prefixed environment
  * variables (cmd/pipeline/pipeline.go:66).
  */
object Templates {

  private val ifBlockRe =
    """(?s)\{\{-?\s*if\s+\.(\w+)\s*-?\}\}(.*?)\{\{-?\s*end\s*-?\}\}""".r
  private val varRe =
    """\{\{\s*\.(\w+)(?:\s*\|\s*default\s+(?:"([^"]*)"|(\S+)))?\s*\}\}""".r

  private def truthy(v: Option[String]): Boolean =
    v.exists(s => s.nonEmpty && s != "false" && s != "0")

  /** Render one template with the given vars (missing var without a
    * default renders empty, matching missingkey=default zero values). */
  def render(template: String, vars: Map[String, String]): String = {
    val afterIf = ifBlockRe.replaceAllIn(template, m =>
      if (truthy(vars.get(m.group(1))))
        scala.util.matching.Regex.quoteReplacement(m.group(2))
      else "")
    varRe.replaceAllIn(afterIf, m => {
      val name = m.group(1)
      val deflt = Option(m.group(2)).orElse(Option(m.group(3)))
      scala.util.matching.Regex.quoteReplacement(
        vars.get(name).orElse(deflt).getOrElse(""))
    })
  }

  /** Load every *.sql under dir (only .sql, like utils.go:90). */
  def loadDir(dir: String): Map[String, String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".sql"))
      .map(p => p.getFileName.toString -> Files.readString(p))
      .toMap

  /** AGN_-prefixed env vars as template vars (AGN_FOO → FOO). */
  def envVars(env: Map[String, String] = sys.env): Map[String, String] =
    env.collect { case (k, v) if k.startsWith("AGN_") => k.stripPrefix("AGN_") -> v }
}

/** `render` CLI parity (cmd/render/render.go:17-63): render a pipeline
  * directory's SQL with --var bindings, optional --filter glob. */
object RenderSql {
  def main(args: Array[String]): Unit = {
    var dir: Option[String] = None
    var vars = Templates.envVars()
    var filter: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--var" =>
          val Array(k, v) = args(i + 1).split("=", 2); vars += (k -> v); i += 2
        case "--filter" => filter = Some(args(i + 1)); i += 2
        case other => dir = Some(other); i += 1
      }
    }
    val d = dir.getOrElse {
      System.err.println("usage: RenderSql <dir> [--var K=V]... [--filter glob]")
      sys.exit(2)
    }
    val glob = filter.map(f =>
      java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$f"))
    // URL-shaped paths (s3a://…, file://…) list *.sql via Hadoop FS,
    // like the reference render's objstr LoadTemplates
    // (cmd/render/render.go:34) — no pipeline.yaml required, matching
    // the local dir listing; http(s) cannot list, so there the set
    // derives from the pipeline config
    val templates =
      if (d.startsWith("http://") || d.startsWith("https://"))
        SqlPipeline.loadPipeline(d)._2
      else if (d.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
        SqlPipeline.listFsTemplates(d)
      else Templates.loadDir(d)
    templates.toSeq.sortBy(_._1).foreach { case (name, tmpl) =>
      if (glob.forall(_.matches(java.nio.file.Paths.get(name)))) {
        println(s"-- $name")
        println(Templates.render(tmpl, vars))
        println()
      }
    }
  }
}
