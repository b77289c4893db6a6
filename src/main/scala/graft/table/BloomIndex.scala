package graft.table

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Typed aggregators behind [[GraftTable.indexBloom]]: fold one FILE's
  * column values into a serialized bloom filter. Used with
  * `groupByKey(file)` so the shuffle carries PARTIAL FILTERS (map-side
  * combine), never raw values — indexing cost is one scan of the
  * unindexed files plus an O(files × filter bytes) shuffle, the same
  * shape Spark's own `df.stat.bloomFilter` treeAggregate uses, but
  * grouped per file. `expected` is sized to the LARGEST candidate file
  * (smaller files just get a slightly over-provisioned filter — bytes,
  * not correctness). */
private[table] final class BloomLongAgg(expected: Long, fpp: Double)
    extends Aggregator[(String, Long), BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expected, fpp)
  override def reduce(b: BloomFilter, a: (String, Long)): BloomFilter = {
    b.putLong(a._2); b
  }
  override def merge(x: BloomFilter, y: BloomFilter): BloomFilter = {
    x.mergeInPlace(y); x
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    b.writeTo(o)
    o.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

private[table] final class BloomStringAgg(expected: Long, fpp: Double)
    extends Aggregator[(String, String), BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expected, fpp)
  override def reduce(b: BloomFilter, a: (String, String)): BloomFilter = {
    b.putString(a._2); b
  }
  override def merge(x: BloomFilter, y: BloomFilter): BloomFilter = {
    x.mergeInPlace(y); x
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    b.writeTo(o)
    o.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
