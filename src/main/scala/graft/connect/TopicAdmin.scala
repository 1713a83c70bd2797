package graft.connect

import scala.collection.concurrent.TrieMap

/** Topic catalog/admin operations — the SURVEY §2 B6 surface, the one
  * reference capability (`sample_kafka_process.sh:56-116, 166-186`) with
  * no query-engine twin until now. The reference manages topics as
  * Strimzi `KafkaTopic` resources: `create_topic` applies a 1-partition,
  * 1-replica, delete-policy manifest; `create_compacted_topic` the same
  * with `cleanup.policy: compact`; `delete_topic` deletes with
  * `--ignore-not-found=true`; `reset_topic` is delete-then-create (and
  * the recreate is the STANDARD policy even if the original was
  * compacted — the script calls plain `create_topic`); `list_topics`
  * enumerates the cluster metadata.
  *
  * Architecture: the admin verbs are a pure policy layer over a
  * [[TopicBackend]] port. In this offline build the backend is
  * [[InMemoryTopicBackend]] (and the contract suite runs against it); on
  * a real cluster the same verbs bind to a Kafka `AdminClient`-backed
  * implementation — the policy layer (argument validation, apply/upsert
  * semantics, ignore-not-found, reset composition) is what the
  * reference script actually encodes and what gets tested.
  */
final case class TopicSpec(
    name: String,
    partitions: Int = 1,
    replicas: Int = 1,
    compacted: Boolean = false) {
  /** The topic's config map as the broker would report it. */
  def config: Map[String, String] =
    if (compacted) Map("cleanup.policy" -> "compact") else Map.empty
}

/** Storage port for [[TopicAdmin]]: upsert/delete/enumerate, nothing
  * else — all policy lives in the admin layer.
  */
trait TopicBackend {
  def list(): Seq[TopicSpec]
  def get(name: String): Option[TopicSpec]
  /** Create-or-replace, `kubectl apply` semantics. */
  def upsert(spec: TopicSpec): Unit
  /** @return true iff the topic existed. */
  def delete(name: String): Boolean
}

/** Thread-safe in-memory backend — the offline stand-in and the test
  * double for the admin contract.
  */
final class InMemoryTopicBackend extends TopicBackend {
  private val topics = TrieMap.empty[String, TopicSpec]
  override def list(): Seq[TopicSpec] = topics.values.toSeq.sortBy(_.name)
  override def get(name: String): Option[TopicSpec] = topics.get(name)
  override def upsert(spec: TopicSpec): Unit = topics.put(spec.name, spec)
  override def delete(name: String): Boolean = topics.remove(name).isDefined
}

/** The admin verbs, with the reference script's exact behaviors. */
final class TopicAdmin(backend: TopicBackend) {

  /** Kafka's public topic-name rules: 1–249 chars of `[a-zA-Z0-9._-]`,
    * and not `.` / `..` (the two names the broker reserves). The script
    * itself only checks non-empty (`error "Topic name is required"`);
    * the charset check fails the same class of bad input fast instead
    * of at the broker.
    */
  private def validate(name: String): String = {
    require(name != null && name.nonEmpty, "Topic name is required")
    require(name != "." && name != "..", s"Invalid topic name: '$name'")
    require(name.length <= 249, s"Topic name too long (${name.length} > 249)")
    require(name.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"Invalid topic name: '$name' (legal: [a-zA-Z0-9._-])")
    name
  }

  /** `list_topics` — cluster metadata enumeration. */
  def listTopics(): Seq[TopicSpec] = backend.list()

  def exists(name: String): Boolean = backend.get(validate(name)).isDefined

  def describe(name: String): Option[TopicSpec] = backend.get(validate(name))

  /** `create_topic` — apply (upsert) a standard delete-policy topic,
    * 1 partition × 1 replica, exactly the reference manifest.
    */
  def createTopic(name: String): TopicSpec = {
    val spec = TopicSpec(validate(name))
    backend.upsert(spec)
    spec
  }

  /** `create_compacted_topic` — same manifest plus
    * `cleanup.policy: compact`.
    */
  def createCompactedTopic(name: String): TopicSpec = {
    val spec = TopicSpec(validate(name), compacted = true)
    backend.upsert(spec)
    spec
  }

  /** `delete_topic` — `--ignore-not-found=true`: deleting an absent
    * topic is success, and the return value says whether it existed.
    */
  def deleteTopic(name: String): Boolean = backend.delete(validate(name))

  /** `reset_topic` — delete then recreate. Reference fidelity: the
    * recreate path is plain `create_topic`, so a compacted topic resets
    * to the STANDARD policy (sample_kafka_process.sh:105-116).
    */
  def resetTopic(name: String): TopicSpec = {
    deleteTopic(name)
    createTopic(name)
  }
}
