package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Engine configuration: providers (storage endpoints as Hadoop FS URIs)
  * and bucket mappings. Mirrors the reference's JSON config
  * (`internal/config/config.go:20-74`, README.md:142-196) with the provider
  * SDK blocks collapsed to a single `uri` per provider — connectors are
  * configuration in Spark, not code (SURVEY.md §7.1).
  */
/** `userProject` is the GCS requester-pays billing project
  * (reference `internal/providers/gcp/client.go:33-41`, surfaced as the
  * provider's `userProject` config key); empty = not requester-pays.
  */
case class ProviderConf(id: String, providerType: String, uri: String,
                        userProject: String = "")
case class MappingConf(sourceProviderId: String, sourceBucket: String,
                       targetProviderId: String, targetBucket: String) {
  /** `"src:srcBucket->tgt:tgtBucket"` (sync.go:93-95). */
  def mappingId: String =
    s"$sourceProviderId:$sourceBucket->$targetProviderId:$targetBucket"
}
case class SyncConfig(providers: Seq[ProviderConf], mappings: Seq[MappingConf],
                      ledgerPath: String) {

  private def providerById(id: String): Option[ProviderConf] =
    providers.find(_.id == id)

  def sourceUri(m: MappingConf): String =
    providerById(m.sourceProviderId).get.uri.stripSuffix("/") + "/" + m.sourceBucket
  def targetUri(m: MappingConf): String =
    providerById(m.targetProviderId).get.uri.stripSuffix("/") + "/" + m.targetBucket

  /** Validation matrix from the reference (`config.go:111-159`):
    * ≥1 provider, unique ids, per-provider uri present, ≥1 mapping,
    * mapping FKs resolve. Returns all violations (the reference fails on
    * the first; collecting them is strictly more informative).
    */
  def validate(): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (providers.isEmpty) errs += "no providers configured"
    val dup = providers.groupBy(_.id).collect { case (id, ps) if ps.size > 1 => id }
    dup.foreach(id => errs += s"duplicate provider id: $id")
    providers.filter(_.uri.isEmpty)
      .foreach(p => errs += s"provider ${p.id}: missing uri")
    if (mappings.isEmpty) errs += "no mappings configured"
    mappings.foreach { m =>
      if (providerById(m.sourceProviderId).isEmpty)
        errs += s"mapping references unknown source provider: ${m.sourceProviderId}"
      if (providerById(m.targetProviderId).isEmpty)
        errs += s"mapping references unknown target provider: ${m.targetProviderId}"
    }
    errs.toSeq
  }
}

object SyncConfig {
  val DefaultLedgerPath = "ledger"  // config.go:97-100 default databasePath

  def load(path: String): SyncConfig =
    parse(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def parse(json: String): SyncConfig = {
    val root = new ObjectMapper().readTree(json)
    val providers = arr(root, "providers").map { p =>
      ProviderConf(str(p, "id"), str(p, "type"), str(p, "uri"),
                   str(p, "userProject"))
    }
    val mappings = arr(root, "mappings").map { m =>
      MappingConf(str(m, "sourceProviderId"), str(m, "sourceBucket"),
                  str(m, "targetProviderId"), str(m, "targetBucket"))
    }
    val ledger = Option(root.get("ledgerPath")).map(_.asText)
      .getOrElse(DefaultLedgerPath)
    SyncConfig(providers, mappings, ledger)
  }

  /** config_save_default (reference `config.go:162-217`). */
  def saveDefault(path: String): Unit = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    val ps = root.putArray("providers")
    val p = ps.addObject()
    p.put("id", "local"); p.put("type", "file"); p.put("uri", "file:///tmp/graft-buckets")
    val ms = root.putArray("mappings")
    val mp = ms.addObject()
    mp.put("sourceProviderId", "local"); mp.put("sourceBucket", "src")
    mp.put("targetProviderId", "local"); mp.put("targetBucket", "dst")
    root.put("ledgerPath", DefaultLedgerPath)
    Files.write(Paths.get(path),
      m.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  private def arr(n: JsonNode, f: String): Seq[JsonNode] =
    Option(n.get(f)).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
  private def str(n: JsonNode, f: String): String =
    Option(n.get(f)).map(_.asText).getOrElse("")
}
