package graft.config

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.config.Json._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Config resolution ahead of DAG building: args templating, context
  * overlays, sub-config imports, and global failure policy.
  *
  * Mirrors the reference's `config/Config.java` semantics
  * (mercari/pipeline):
  *  - `args` / `system.args` declared in the config merge over the
  *    caller-supplied args (config wins, matching `processArgs` which
  *    puts config entries into the CLI map last); arg VALUES may
  *    reference other args with `${args.k}` and resolve iteratively.
  *  - `${args.key}` placeholders substitute across the whole config
  *    text before the final parse.
  *  - a `context` (caller-passed, else `system.context`) applies
  *    tag-based module selection (`ModuleConfig.applyContext`): with a
  *    context active, a module runs only when its `tags` contain the
  *    context — untagged modules are ignored, and an explicit
  *    `ignore: true` is overridden by a matching tag (the reference
  *    overwrites `ignore` unconditionally).
  *  - `imports` / `system.imports` (`{base, files, args}`) load
  *    sub-configs and append their sources/transforms/sinks, each file
  *    resolved with the import's args (parent args win on conflict,
  *    matching `Import.setDefaults`) and the same context.
  *  - `system.failure` carries the global failure policy: `failFast`
  *    (stamped onto every module, as `Config.parse` does via
  *    `setFailFast`), and `alterConfig` (an alternate config executed
  *    when this pipeline fails to build — `MPipeline.java:93-106`).
  *
  * Config text may also be supplied as a local file path or a
  * `data:<base64>` literal, the two transports of the reference's
  * `Config.load` that exist outside GCP.
  */
object ConfigLoader {

  /** Global failure policy (`Config.Failure`). */
  case class FailurePolicy(
      failFast: Option[Boolean],
      union: Boolean,
      alterConfig: Option[String])

  case class Resolved(
      root: JsonNode,
      args: Map[String, String],
      context: Option[String],
      failure: FailurePolicy)

  private val MaxImportDepth = 8

  /** Accept a raw config body, a local file path, or `data:<b64>`
    * (`Config.load` transports; GCS/SecretManager/PubSub param
    * sources are vendor-scoped out). */
  def readConfigText(param: String): String =
    if (param.startsWith("data:"))
      new String(Base64.getDecoder.decode(param.stripPrefix("data:")),
        StandardCharsets.UTF_8)
    else {
      val path =
        try { val p = Paths.get(param); if (Files.isRegularFile(p)) Some(p) else None }
        catch { case _: Throwable => None }
      path.map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
        .getOrElse(param)
    }

  def resolve(
      configText: String,
      cliArgs: Map[String, String] = Map.empty,
      context: Option[String] = None): Resolved =
    resolveRec(readConfigText(configText), cliArgs, context, depth = 0,
      seenFiles = Set.empty)

  private def resolveRec(
      rawText: String,
      callerArgs: Map[String, String],
      callerContext: Option[String],
      depth: Int,
      seenFiles: Set[String]): Resolved = {
    if (depth > MaxImportDepth)
      throw new IllegalArgumentException(
        s"config imports nested deeper than $MaxImportDepth — cycle?")

    // pass 1: parse just to pull declared args (they may be
    // referenced by placeholders anywhere in the text, including in
    // the args block itself). Unsubstituted `${...}` in value
    // position is legal YAML (plain scalar) but not strict JSON, so
    // fall back to a caller-substituted parse, then to no declared
    // args — the final parse below reports real syntax errors.
    val pre =
      try Json.parse(rawText)
      catch {
        case _: Throwable =>
          try Json.parse(graft.Pipeline.substituteArgs(rawText, callerArgs))
          catch { case _: Throwable => Json.obj() }
      }
    val declared = declaredArgs(pre)
    val merged = resolveArgValues(callerArgs ++ declared)

    val text = graft.Pipeline.substituteArgs(rawText, merged)
    val root = Json.parse(text)

    val system = root("system")
    val context = callerContext
      .orElse(system.flatMap(_.str("context")))
      .filter(_.nonEmpty)

    val failureNode = system.flatMap(_.apply("failure"))
    val failure = FailurePolicy(
      failFast = failureNode.flatMap(_.bool("failFast")),
      union = failureNode.flatMap(_.bool("union")).getOrElse(false),
      alterConfig = failureNode.flatMap(_.str("alterConfig")))

    val rootObj = root.asInstanceOf[ObjectNode]
    // pipeline-level failure sinks (`failures:` section +
    // `system.failure.union: true`, MErrorHandler.java:37-48): when
    // active, modules route bad records instead of the lenient
    // null-out, so the union has something to collect — the Spark
    // analogue of Beam's pipeline BadRecord handler hooking every
    // module automatically
    // context tag-filtering applies to failure sinks exactly like
    // modules (FailureConfig.applyContext, Config.java:380): an
    // untagged failure sink under a context is disabled, so a config
    // that switches failure destinations via tags (untagged prod +
    // tags:[dev] dev sink) never double-writes. Resolved BEFORE
    // failuresActive so bad records aren't split off the main output
    // when every declared failure sink is context-disabled.
    root.arrOf("failures").foreach(applyContext(_, context))
    val failuresActive = root.arrOf("failures")
        .exists(!_.bool("ignore").getOrElse(false)) &&
      failure.union && !failure.failFast.getOrElse(false)
    Seq("sources", "transforms", "sinks").foreach { section =>
      root.arrOf(section).foreach { m =>
        applyContext(m, context)
        val obj = m.asInstanceOf[ObjectNode]
        failure.failFast.foreach(ff => obj.put("failFast", ff))
        // module-scoped failures (`failures:` on the module itself)
        // route that module's bad records regardless of the global
        // union flag. Context filters them by the same rule as
        // pipeline-level failure sinks (and as the module itself);
        // only survivors flip outputFailure on.
        m.arrOf("failures").foreach(applyContext(_, context))
        val moduleScoped = m.arrOf("failures")
          .exists(!_.bool("ignore").getOrElse(false))
        if ((failuresActive || moduleScoped) && section != "sinks" &&
            !obj.has("outputFailure"))
          obj.put("outputFailure", true)
      }
    }

    // imports: top-level (deprecated in the reference) + system.imports
    val imports = root.arrOf("imports") ++
      system.map(_.arrOf("imports")).getOrElse(Seq.empty)
    imports.foreach { imp =>
      val base = imp.str("base").getOrElse("")
      val impArgs = imp("args").map(argsOf).getOrElse(Map.empty)
      // parent args override the import's own defaults
      // (Import.setDefaults does putAll(parent) last)
      val effective = resolveArgValues(impArgs ++ merged)
      imp.strArr("files").foreach { f =>
        val path = base + f
        val canon =
          try Paths.get(path).toAbsolutePath.normalize.toString
          catch { case _: Throwable => path }
        if (seenFiles.contains(canon))
          throw new IllegalArgumentException(
            s"config import cycle detected at: $path")
        val sub = resolveRec(readConfigText(path), effective, context,
          depth + 1, seenFiles + canon)
        Seq("sources", "transforms", "sinks").foreach { section =>
          val added = sub.root.arrOf(section)
          if (added.nonEmpty) {
            val target = rootObj.get(section) match {
              case a: ArrayNode => a
              case _ =>
                val a = Json.arr(); rootObj.set(section, a); a
            }
            added.foreach(target.add)
          }
        }
      }
    }

    Resolved(root, merged, context, failure)
  }

  /** `applyContext` (ModuleConfig.java:92-101): with a context, only
    * modules tagged with it run; `ignore` is overwritten either way. */
  private def applyContext(m: JsonNode, context: Option[String]): Unit =
    context.foreach { ctx =>
      val tags = m.strArr("tags")
      m.asInstanceOf[ObjectNode].put("ignore", !tags.contains(ctx))
    }

  private def declaredArgs(root: JsonNode): Map[String, String] = {
    val top = root("args").map(argsOf).getOrElse(Map.empty)
    val sys = root("system").flatMap(_.apply("args")).map(argsOf)
      .getOrElse(Map.empty)
    top ++ sys
  }

  private def argsOf(node: JsonNode): Map[String, String] =
    node.names.map { k =>
      val v = node.get(k)
      k -> (if (v.isTextual) v.asText else v.toString)
    }.toMap

  /** Arg values may reference other args (`{n: 3, path: "/d/${args.n}"}`);
    * resolve iteratively to a fixpoint (bounded — self-references
    * would otherwise loop). */
  private def resolveArgValues(args: Map[String, String]): Map[String, String] = {
    var current = args
    var i = 0
    var changed = true
    while (changed && i < 8) {
      val next = current.map { case (k, v) =>
        k -> graft.Pipeline.substituteArgs(v, current - k)
      }
      changed = next != current
      current = next
      i += 1
    }
    current
  }
}
