package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding tokenizer with a FIXED shipped merge
  * table — the way a training pipeline budgets tokens (a pretrained
  * tokenizer is an artifact, never retrained per query; Sennrich et al.
  * 2016 for the algorithm).
  *
  * The merge table is trained once, at class init, from an embedded
  * training text (pure Scala, deterministic tie-breaks), so engine and
  * oracle share one source of truth: the DuckDB oracle embeds the SAME
  * table as a CASE lookup and replays [[encode]] as a recursive CTE.
  * Frequent pipeline words collapse to single tokens; words absent from
  * the training text split into subwords — both behaviors exercised by
  * the fixture corpus.
  *
  * ENCODE CONTRACT (must stay in lockstep with the SQL in
  * TextOps.oracles("q_bpe_count")): start from single characters; each
  * step merges ONE pair instance — the LEFTMOST occurrence of the
  * LOWEST-priority applicable merge — until none applies. (Classic BPE
  * merges all instances of the winning pair per step; one-at-a-time
  * leftmost reaches the same fixpoint for non-overlapping occurrences
  * and is deterministic for overlapping ones, while staying expressible
  * as `list_position(prios, list_min(prios))` per recursion step.)
  */
object Bpe {
  /** Embedded training text: the pipeline-vocabulary words with rough
    * Zipf-ish repetition. Roughly a third of the corpus vocabulary
    * (customer, vector, window, stream, column, query, value, batch) is
    * deliberately ABSENT so those words exercise the subword path.
    * Exposed to BpeSpec: the distributed trainer
    * (TextOps.bpeTrain) run over this same text must reproduce
    * [[merges]] exactly. */
  private[graft] val trainingText: String = {
    val weighted = Seq(
      "the" -> 12, "join" -> 10, "hash" -> 9, "row" -> 9, "scan" -> 8,
      "filter" -> 8, "small" -> 7, "slow" -> 7, "merge" -> 7, "order" -> 6,
      "line" -> 6, "data" -> 6, "table" -> 6, "agg" -> 5, "key" -> 5,
      "spark" -> 5, "a" -> 5, "group" -> 4, "part" -> 4, "big" -> 4,
      "sort" -> 4, "fast" -> 3, "dup" -> 2)
    weighted.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
  }

  val MaxMerges = 200

  /** The shipped merge table, priority = index (lower merges first). */
  lazy val merges: Vector[(String, String)] = train(trainingText, MaxMerges)

  private lazy val prio: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Classic BPE training: count symbol pairs over the word multiset,
    * repeatedly promote the most frequent pair (ties: lexicographically
    * smallest) to a merge. Stops early when no pair repeats. */
  private[functions] def train(text: String, nMerges: Int): Vector[(String, String)] = {
    var vocab: Map[Vector[String], Int] = text.toLowerCase
      .split("\\W+").filter(_.nonEmpty).toSeq
      .groupBy(w => w.map(_.toString).toVector)
      .map { case (k, ws) => k -> ws.size }
    val out = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Int]()
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0) + c))
      // a pair seen once is noise, not a unit
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        vocab = vocab.map { case (syms, c) => (mergeAll(syms, best), c) }
      }
      n += 1
    }
    out.result()
  }

  /** Training-side helper: merge all left-to-right non-overlapping
    * occurrences of `pair` (only training uses batch merging; encode is
    * one-at-a-time by contract). Shared with the DISTRIBUTED trainer
    * (TextOps.bpeTrain) so the per-round merge semantics cannot drift
    * between the embedded and corpus-level training paths. */
  private[graft] def mergeAll(syms: Seq[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Apply the shipped merges to one word (see ENCODE CONTRACT above). */
  def encode(word: String): Vector[String] = encodeLoop(word, prio)

  /** [[encode]] under an ARBITRARY merge table — how a corpus-learned
    * table (TextOps.bpeTrain) feeds the counting path; BpeSpec pins
    * learned-table → count equivalence through this entry. */
  def encodeWith(word: String, table: Seq[(String, String)]): Vector[String] =
    encodeLoop(word, table.zipWithIndex.toMap)

  private def encodeLoop(word: String,
      prio: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestPrio = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val p = prio.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (p < bestPrio) { bestPrio = p; bestPos = i } // strict <: leftmost
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        syms = (syms.take(bestPos) :+ (syms(bestPos) + syms(bestPos + 1))) ++
          syms.drop(bestPos + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Token count of one word under the shipped merges (codegen entry). */
  def countTokens(word: UTF8String): Int =
    if (word == null) 0 else encode(word.toString).length
}

/** `bpe_count(word)`: BPE token count of a word under [[Bpe.merges]].
  * The per-word loop is a real iterative algorithm, so codegen emits a
  * static call rather than inlining. When invoked from a higher-order
  * lambda (the q_bpe_count shape) the lambda plumbing is interpreted —
  * HOFs are CodegenFallback — but every element call still executes this
  * compiled merge loop, and used in a plain projection the expression
  * joins the whole-stage span via [[doGenCode]]. No UDF serialization
  * either way. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
