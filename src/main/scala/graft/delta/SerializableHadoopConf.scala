package graft.delta

import org.apache.hadoop.conf.Configuration

/** Ships a Hadoop [[Configuration]] (not `java.io.Serializable` itself)
  * into Spark task closures via Hadoop's own `Writable` wire format —
  * needed by jobs whose tasks open a FileSystem themselves, e.g. the
  * distributed vacuum listing. Deliberately tiny and owned here rather
  * than reaching for Spark's internal `SerializableConfiguration`.
  */
private[graft] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
