package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.{GraftBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Resource fingerprinting.
  *
  * Replicates the reference's `CalculateFingerprint(attrs, ResourceHierarchy())`
  * (`utils/fingerprint/fingerprint.go:25-47,70-206,213-229`):
  *  - walk a dimension hierarchy, picking the FIRST present label per level
  *    and the FIRST sub-hierarchy that yields any labels;
  *  - append `hash=<fnv1a64>` where the hash runs over name-sorted `k=v`
  *    pairs with 0xFF separators (`utils/fingerprint/hash.go:32-52`);
  *  - join parts with ';' -> e.g. `service.name=s;hash=12345`.
  *
  * Pure per-row function of the resource map; exposed as a codegen-friendly
  * expression so the exporter stage stays in whole-stage codegen.
  */
object Fingerprint {

  final case class Node(labels: Seq[String], sub: Seq[Node] = Nil)

  /** The reference resource hierarchy (`fingerprint.go:70-206`), verbatim;
    * built bottom-up for readability.
    */
  val resourceHierarchy: Node = {
    // logical/service-oriented view
    val component = Node(Seq("component"))
    val containerL = Node(Seq("k8s.container.name", "container.name", "container_name"),
      Seq(component))
    val instance = Node(Seq("service.instance.id", "k8s.pod.name", "k8s.pod.uid",
      "aws.ecs.task.id", "aws.ecs.task.arn", "cloudwatch.log.stream",
      "cloud.resource_id", "faas.instance", "host.id", "host.name",
      "host.ip", "host"), Seq(containerL))
    val environment = Node(Seq("deployment.environment", "ec2.tag.env-short",
      "ec2.tag.env", "env"), Seq(instance))
    val service = Node(Seq("service.name", "cloudwatch.log.group.name",
      "k8s.deployment.name", "k8s.deployment.uid",
      "k8s.statefulset.name", "k8s.statefulset.uid",
      "k8s.daemonset.name", "k8s.daemonset.uid",
      "k8s.job.name", "k8s.job.uid",
      "k8s.cronjob.name", "k8s.cronjob.uid",
      "faas.name", "ec2.tag.service"), Seq(environment))
    val namespace = Node(Seq("service.namespace", "k8s.namespace.name",
      "ec2.tag.service-group"), Seq(service))
    // node-oriented view
    val containerN = Node(Seq("k8s.container.name", "container.name"))
    val podN = Node(Seq("k8s.pod.name", "k8s.pod.uid", "aws.ecs.task.id",
      "aws.ecs.task.arn"), Seq(containerN))
    val nodeN = Node(Seq("k8s.node.name", "k8s.node.uid", "host.id", "host.name",
      "host.ip", "host"), Seq(podN))
    val az = Node(Seq("cloud.availability_zone"), Seq(nodeN))

    val cluster = Node(Seq("k8s.cluster.name", "k8s.cluster.uid", "aws.ecs.cluster.arn"),
      Seq(namespace, az))
    val platform = Node(Seq("cloud.platform", "source_type"), Seq(cluster))
    val region = Node(Seq("cloud.region", "aws.region"), Seq(platform))
    val gcp = Node(Seq("gcp.project"), Seq(region))
    val account = Node(Seq("cloud.account.id"), Seq(gcp))
    Node(Seq("cloud.provider"), Seq(account))
  }

  private val offset64 = -3750763034362895579L // 14695981039346656037 as signed
  private val prime64 = 1099511628211L

  def hashAdd(h0: Long, s: String): Long = {
    var h = h0
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= prime64
      i += 1
    }
    h
  }

  def hashAddByte(h0: Long, b: Int): Long = {
    var h = h0
    h ^= (b & 0xffL)
    h *= prime64
    h
  }

  /** FNV-1a over name-sorted k=v pairs with 0xFF separators; returned as the
    * unsigned decimal string Go's `%v` prints.
    */
  def fingerprintHash(attrs: Seq[(String, String)]): String = {
    if (attrs.isEmpty) return java.lang.Long.toUnsignedString(offset64)
    var sum = offset64
    attrs.sortBy(_._1).foreach { case (k, v) =>
      sum = hashAdd(sum, k)
      sum = hashAddByte(sum, 0xff)
      sum = hashAdd(sum, v)
      sum = hashAddByte(sum, 0xff)
    }
    java.lang.Long.toUnsignedString(sum)
  }

  def identifier(node: Node, attrs: Map[String, String]): Seq[(String, String)] = {
    val own = node.labels.collectFirst {
      case l if attrs.contains(l) => (l, attrs(l))
    }.toSeq
    val sub = node.sub.iterator.map(identifier(_, attrs)).find(_.nonEmpty).getOrElse(Nil)
    own ++ sub
  }

  def calculate(attrs: Map[String, String]): String = {
    val parts = identifier(resourceHierarchy, attrs).map { case (k, v) => s"$k=$v" } :+
      s"hash=${fingerprintHash(attrs.toSeq)}"
    parts.mkString(";")
  }
}

/** Per-task worker bridging MapData -> fingerprint string.
  *
  * Resource maps are extremely low-cardinality relative to rows (the whole
  * point of resource fingerprinting), so the hierarchy walk + sort + FNV +
  * string build is memoized per distinct map content — profiled as ~10% of
  * pipeline CPU un-memoized. Bounded cache, per task instance.
  */
final class FingerprintWorker extends Serializable {
  // shared across task threads in local mode -> must be concurrent
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()

  def calc(m: MapData): UTF8String = {
    if (m == null) return null
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < n) {
      sb.append(keys.getUTF8String(i)).append('\u0000')
      if (!vals.isNullAt(i)) sb.append(vals.getUTF8String(i))
      sb.append('\u0001')
      i += 1
    }
    val cacheKey = sb.toString
    val hit = cache.get(cacheKey)
    if (hit != null) return hit
    val pairs = new Array[(String, String)](n)
    i = 0
    while (i < n) {
      pairs(i) = (keys.getUTF8String(i).toString,
        if (vals.isNullAt(i)) "" else vals.getUTF8String(i).toString)
      i += 1
    }
    val result = UTF8String.fromString(Fingerprint.calculate(pairs.toMap))
    if (cache.size < 65536) cache.put(cacheKey, result)
    result
  }
}

/** `resource_fingerprint(map)` -> hierarchy-labeled FNV-1a fingerprint. */
case class ResourceFingerprint(child: Expression) extends UnaryExpression {
  private lazy val worker = new FingerprintWorker

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    worker.calc(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("worker", worker, classOf[FingerprintWorker].getName)
    defineCodeGen(ctx, ev, input => s"$w.calc($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): ResourceFingerprint =
    copy(child = newChild)
}

object ResourceFingerprint {
  def apply(c: Column): Column =
    ExpressionUtils.column(ResourceFingerprint(ExpressionUtils.expression(c)))
}
