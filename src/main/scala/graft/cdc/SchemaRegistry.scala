package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Confluent-style SCHEMA REGISTRY semantics (reference README.md:17 —
  * the Kafka-ecosystem piece every wire deployment pairs with the
  * broker): producers register subject schemas and stamp every record
  * with its SCHEMA ID (Confluent frames it as a magic byte + 4-byte id
  * OUTSIDE the payload — here an explicit `schema_id` wire column);
  * the registry gates each registration through a COMPATIBILITY level,
  * and consumers resolve mixed-id wires by decoding each record under
  * the schema it was written with, then conforming to the subject's
  * latest.
  *
  * Compatibility levels map onto A43's change-verdict vocabulary
  * ([[SchemaEvolution.compatReport]]):
  *  - BACKWARD (new reader reads old data): rejects `breaking_type`
  *    (narrowing / semantic type change); adds, drops, and widenings
  *    pass — old records surface NULL for added columns.
  *  - FORWARD (old readers read new data): additionally rejects drops
  *    (`breaking_consumers`), drop+add renames (`suspected_rename`),
  *    and ALL type changes — a widened value breaks the old reader
  *    even though the new one could read back (`widening_ok` is a
  *    backward-only grace).
  *  - FULL: backward ∧ forward — only pure adds pass.
  *  - NONE: everything registers.
  *
  * The registry itself is coordinator metadata (|subjects × versions|
  * rows, driver-held like the Changefeed config); only [[resolve]]
  * touches data, and it scans the wire once per REGISTERED id —
  * metadata-bounded, the A58 per-batch classify discipline. */
object SchemaRegistry {

  /** One accepted registration. `fields` are (name, dialect type). */
  final case class Entry(subject: String, id: Int, version: Int,
                         fields: Seq[(String, String)])

  /** Driver-side change classification between consecutive schemas —
    * the same verdict classes as [[SchemaEvolution.compatReport]]
    * (kept in lockstep; RegistrySpec pins the parity). */
  private[graft] def changeVerdicts(old: Seq[(String, String)],
                                  next: Seq[(String, String)])
      : Seq[(String, String)] = {
    val oldM = old.toMap
    val nextM = next.toMap
    val droppedTypes = old.filterNot(f => nextM.contains(f._1))
      .map(_._2).toSet
    val addedTypes = next.filterNot(f => oldM.contains(f._1))
      .map(_._2).toSet
    val adds = next.filterNot(f => oldM.contains(f._1)).map { case (n, t) =>
      n -> (if (droppedTypes.contains(t)) "suspected_rename"
            else "compat_with_default")
    }
    val drops = old.filterNot(f => nextM.contains(f._1)).map { case (n, t) =>
      n -> (if (addedTypes.contains(t)) "suspected_rename"
            else "breaking_consumers")
    }
    val alters = next.flatMap { case (n, t) =>
      oldM.get(n).filter(_ != t).map { ot =>
        n -> (if (SchemaEvolution.wideningPairs.contains((ot, t)))
          "widening_ok" else "breaking_type")
      }
    }
    adds ++ drops ++ alters
  }

  /** Verdict classes each level refuses. */
  private val rejectedBy: Map[String, Set[String]] = Map(
    "NONE" -> Set.empty,
    "BACKWARD" -> Set("breaking_type"),
    "FORWARD" -> Set("breaking_type", "breaking_consumers",
      "suspected_rename", "widening_ok"),
    "FULL" -> Set("breaking_type", "breaking_consumers",
      "suspected_rename", "widening_ok"))

  /** The registry: register/latest/byId over one subject namespace. */
  final class Registry(val level: String) extends Serializable {
    require(rejectedBy.contains(level), s"unknown compat level $level")
    private var entries = Vector.empty[Entry]
    private var nextId = 1

    /** Gate `fields` against the subject's latest under the registry's
      * level; Left(reason) keeps the registry unchanged. */
    def register(subject: String, fields: Seq[(String, String)])
        : Either[String, Entry] = {
      latest(subject) match {
        case Some(prev) =>
          val bad = changeVerdicts(prev.fields, fields)
            .filter { case (_, v) => rejectedBy(level).contains(v) }
          if (bad.nonEmpty)
            return Left(bad.map { case (c, v) => s"$c: $v" }.sorted
              .mkString(s"incompatible under $level — ", "; ", ""))
        case None => ()
      }
      val e = Entry(subject, nextId,
        entries.count(_.subject == subject) + 1, fields)
      entries :+= e
      nextId += 1
      Right(e)
    }

    def latest(subject: String): Option[Entry] =
      entries.filter(_.subject == subject).lastOption
    def byId(id: Int): Entry = entries.find(_.id == id)
      .getOrElse(throw new IllegalArgumentException(s"unknown schema id $id"))
    def all: Seq[Entry] = entries
  }

  private def sparkType(dialect: String): DataType = dialect match {
    case "BIGINT" => LongType
    case "INTEGER" => IntegerType
    case "DOUBLE" => DoubleType
    case "VARCHAR" => StringType
    case "TIMESTAMP" => TimestampType
    case d if d.startsWith("DECIMAL") =>
      val Array(p, s) = d.stripPrefix("DECIMAL(").stripSuffix(")")
        .split(',').map(_.trim.toInt)
      DecimalType(p, s)
    case other =>
      throw new IllegalArgumentException(s"unmapped dialect type $other")
  }

  private[cdc] def payloadStruct(e: Entry): StructType =
    StructType(e.fields.map { case (n, t) => StructField(n, sparkType(t)) })

  /** Resolve a mixed-id wire (`schema_id`, `envelope`) through the
    * registry: every record decodes under the schema it was WRITTEN
    * with, then conforms to the subject's latest (columns the record's
    * schema lacked surface NULL; columns the latest dropped vanish).
    * One wire scan per registered id of the subject — |registry|-
    * bounded, never |wire|-bounded. Records carrying an id the
    * registry never issued fail loudly (a forged or foreign id is an
    * operator error, not a silent drop). */
  def resolve(wire: DataFrame, registry: Registry, subject: String,
              database: String, table: String): DataFrame = {
    val entries = registry.all.filter(_.subject == subject)
    require(entries.nonEmpty, s"no schemas registered for $subject")
    val known = entries.map(_.id.toLong)
    // isNull is checked explicitly: a NULL schema_id would make the
    // isin predicate NULL and bypass the guard, then be silently
    // dropped by every per-id filter below — null framing must fail
    // as loudly as a forged id (ADVICE r15)
    val unknown = wire
      .where(col("schema_id").isNull ||
        !col("schema_id").isin(known: _*)).limit(1).count()
    require(unknown == 0L,
      s"wire carries a null or never-registered schema id for $subject")
    val latestFields = entries.last.fields.map(_._1)
    entries.map { e =>
      val dec = Envelope.decode(
        wire.where(col("schema_id") === e.id).select(Envelope.EnvelopeCol),
        payloadStruct(e), database, table)
      val have = e.fields.map(_._1).toSet
      dec.select(
        Seq(col("key"), col("commit_ts_us"), col("seq"), col("op")) ++
          latestFields.map(f =>
            if (have.contains(f)) col(f)
            else lit(null).cast(sparkType(
              entries.last.fields.find(_._1 == f).get._2)).as(f)): _*)
    }.reduce(_ unionByName _)
  }
}
