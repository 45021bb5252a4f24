package graft.util

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper around a Hadoop [[Configuration]] (which is
  * Writable but not Serializable), so executor-side closures can open
  * files with the DRIVER's filesystem settings — credentials, scheme
  * implementations, timeouts — instead of a default `new Configuration()`
  * that only works for the local filesystem. Standard Writable-in-
  * Serializable pattern (Hadoop's own ObjectWritable does the same dance).
  */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  def value: Configuration = conf

  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
