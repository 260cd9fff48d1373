package graft.core

/** Optional lower/upper bound for the `range` rule. The reference skips a
  * bound when it is falsy, so bound == 0 silently disables it
  * (petk/tools.py:105,107 — an evident truthiness bug). We treat None as
  * "no bound" and 0 as an active bound; deviation documented in SURVEY.md
  * A47. */
final case class Bounds(lower: Option[Double], upper: Option[Double])

/** Per-column validation schema, the typed equivalent of the reference's
  * `dict[column -> dict[rule -> params]]` (petk/exploration.py:14-25,
  * README.md:42-60). `nulls` are extra null sentinels consumed at ingest
  * (petk/exploration.py:27-29); the rest dispatch to validation rules
  * (petk/validation.py). The documented-but-dead `default` key
  * (README.md:45) is intentionally not modeled. */
final case class ColumnRules(
    nulls: Seq[Any] = Nil,
    accepted: Option[Seq[Any]] = None,
    range: Option[Bounds] = None,
    boundingBox: Option[(Double, Double, Double, Double)] = None,
    sliver: Option[SliverParams] = None)

/** Params of the geo `sliver` rule (petk/validation.py:53-60). */
final case class SliverParams(projectedEpsg: Int, threshold: Double)
