package graft.crawl

import java.nio.ByteBuffer

/** A partial-key cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher,
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
  * paper) over string keys: the deletion-capable alternative to the Bloom
  * shards in [[SeenSet]]. 16-bit fingerprints, 4-way buckets, alternate
  * bucket `i2 = i1 XOR hash(fp)` so relocation needs only the stored
  * fingerprint.
  *
  * Contract (what the seen-set routing relies on):
  *  - NEVER false-negative for an inserted-and-not-deleted key;
  *  - `delete` is only safe for keys actually inserted (deleting an absent
  *    key could evict another key's colliding fingerprint copy) — callers
  *    must pre-filter against the exact seen table;
  *  - if an insert or merge cannot place a fingerprint (filter past its
  *    ~95% load limit), the filter flips to `saturated` and `mightContain`
  *    answers TRUE for everything: routing stays correct (every candidate
  *    pays the exact confirm), only the fast path degrades.
  *
  * Everything is deterministic — no RNG: the eviction walk's victim slot
  * cycles with the kick count, and shard builds insert in sorted key order
  * so serialized bytes are reproducible run-to-run.
  */
final class CuckooFilter private (val buckets: Int,
                                  private val slots: Array[Short],
                                  private var count: Int,
                                  private var saturatedFlag: Boolean)
    extends Serializable {
  import CuckooFilter._

  def size: Int = count
  def saturated: Boolean = saturatedFlag

  /** Slots a fingerprint can live in for bucket index `i`. */
  @inline private def altIndex(i: Int, fp: Int): Int =
    (i ^ splitmix64(fp.toLong).toInt) & (buckets - 1)

  private def bucketHas(i: Int, fp: Int): Int = {
    val base = i << 2
    var s = 0
    while (s < 4) {
      if ((slots(base + s) & 0xffff) == fp) return base + s
      s += 1
    }
    -1
  }

  private def freeSlot(i: Int): Int = {
    val base = i << 2
    var s = 0
    while (s < 4) {
      if (slots(base + s) == 0) return base + s
      s += 1
    }
    -1
  }

  def insert(key: String): Boolean = {
    val h = hash64(key)
    insertFp(fingerprint(h), indexOf(h))
  }

  /** Insert a bare fingerprint starting from bucket `i` — also the merge
    * path (a stored fingerprint's current bucket is always one of its two
    * legal buckets, and the XOR pairing is symmetric). */
  def insertFp(fp: Int, i: Int): Boolean = {
    if (saturatedFlag) return true
    val i1 = i & (buckets - 1)
    val i2 = altIndex(i1, fp)
    var slot = freeSlot(i1)
    if (slot < 0) slot = freeSlot(i2)
    if (slot >= 0) { slots(slot) = fp.toShort; count += 1; return true }
    // both buckets full: deterministic eviction walk
    var curFp = fp
    var curI = if ((fp & 1) == 0) i1 else i2
    var kicks = 0
    while (kicks < MaxKicks) {
      val victim = (curI << 2) + (kicks & 3)
      val evicted = slots(victim) & 0xffff
      slots(victim) = curFp.toShort
      curFp = evicted
      curI = altIndex(curI, curFp)
      val free = freeSlot(curI)
      if (free >= 0) { slots(free) = curFp.toShort; count += 1; return true }
      kicks += 1
    }
    // could not place the displaced fingerprint: flip to saturated rather
    // than lose it (losing it would be a false negative)
    saturatedFlag = true
    count += 1
    true
  }

  def mightContain(key: String): Boolean = {
    if (saturatedFlag) return true
    val h = hash64(key)
    val fp = fingerprint(h)
    val i1 = indexOf(h)
    bucketHas(i1, fp) >= 0 || bucketHas(altIndex(i1, fp), fp) >= 0
  }

  /** Remove ONE stored copy of `key`'s fingerprint; true when found. Only
    * call for keys known to be inserted (see class contract). A saturated
    * filter refuses deletes (slots may hold fingerprints the eviction walk
    * abandoned — removal could false-negative a live key). */
  def delete(key: String): Boolean = {
    if (saturatedFlag) return false
    val h = hash64(key)
    val fp = fingerprint(h)
    val i1 = indexOf(h)
    var slot = bucketHas(i1, fp)
    if (slot < 0) slot = bucketHas(altIndex(i1, fp), fp)
    if (slot < 0) false
    else { slots(slot) = 0; count -= 1; true }
  }

  /** Fold `other`'s stored fingerprints into this filter (same geometry
    * required). Merging a saturated input keeps the union conservative by
    * saturating the result. */
  def mergeInPlace(other: CuckooFilter): CuckooFilter = {
    require(other.buckets == buckets,
      s"cuckoo merge with different geometry: $buckets vs ${other.buckets} buckets")
    if (other.saturatedFlag) saturatedFlag = true
    else {
      var slot = 0
      while (slot < other.slots.length && !saturatedFlag) {
        val fp = other.slots(slot) & 0xffff
        if (fp != 0) insertFp(fp, slot >> 2)
        slot += 1
      }
    }
    this
  }

  @inline private def indexOf(h: Long): Int =
    (h & (buckets - 1)).toInt

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(9 + slots.length * 2)
    buf.putInt(buckets)
    buf.putInt(count)
    buf.put(if (saturatedFlag) 1.toByte else 0.toByte)
    slots.foreach(buf.putShort)
    buf.array()
  }
}

object CuckooFilter {
  /** Abandoned-relocation bound from the paper; beyond it the table is
    * effectively full. */
  private val MaxKicks = 500

  /** Size for `expected` keys at ≤~95% load, 4-way buckets, power-of-two
    * bucket count (required by the XOR partial-key pairing). */
  def create(expected: Long): CuckooFilter = {
    // Real ceiling: the slots array is b×4 Shorts with b a power of two, so
    // b ≤ 2^28 (b=2^29 would make (b*4).toInt overflow to Int.MinValue →
    // NegativeArraySizeException). At the 0.95 design load that admits
    // expected ≤ 2^28·4·0.95 ≈ 1.02e9 keys/shard; past it, raise the
    // shard count.
    val maxExpected = (1L << 28) * 4L * 95L / 100L
    require(expected >= 0 && expected <= maxExpected,
      s"cuckoo shard capacity $expected exceeds $maxExpected keys " +
        "(2^28 buckets x 4 slots at 0.95 load); raise shard count")
    val minBuckets = math.max(1L, math.ceil(expected / 4.0 / 0.95).toLong)
    var b = 1L
    while (b < minBuckets) b <<= 1
    new CuckooFilter(b.toInt, new Array[Short]((b * 4).toInt), 0, false)
  }

  def readFrom(bytes: Array[Byte]): CuckooFilter = {
    val buf = ByteBuffer.wrap(bytes)
    val buckets = buf.getInt
    val count = buf.getInt
    val saturated = buf.get() == 1
    val slots = new Array[Short](buckets * 4)
    var i = 0
    while (i < slots.length) { slots(i) = buf.getShort; i += 1 }
    new CuckooFilter(buckets, slots, count, saturated)
  }

  /** FNV-1a 64 over UTF-8 bytes, splitmix64-finalized — deterministic
    * across JVMs (no object hash codes, no seed state). */
  def hash64(key: String): Long = {
    val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    splitmix64(h)
  }

  /** 16-bit fingerprint from the hash's top bits; 0 is the empty-slot
    * sentinel so fingerprints live in [1, 0xffff]. */
  @inline def fingerprint(h: Long): Int = {
    val fp = ((h >>> 48) & 0xffff).toInt
    if (fp == 0) 1 else fp
  }

  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}
