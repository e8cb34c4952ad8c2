package graft.model

/** Cosmology metadata derived from snapshot header attributes — the
  * scida CosmologyMixin re-expressed driver-side (reference:
  * src/scida/interfaces/mixins/cosmology.py:16 `CosmologyMixin`,
  * :135 `get_redshift_from_rawmetadata`, :160
  * `get_cosmology_from_rawmetadata`).
  *
  * All of this is tiny per-snapshot scalar metadata: it is computed
  * once on the driver from the already-memoized chunk-0 attributes
  * (`ChunkedHdf5.attrs`) and enters query plans only as literals
  * (e.g. the comoving→physical scale factor becomes one codegen'd
  * multiply per row) — nothing here touches the distributed data path.
  *
  * @param h           dimensionless Hubble parameter (HubbleParam)
  * @param omega0      matter density Ω₀, when present
  * @param omegaBaryon baryon density Ω_b, when present
  * @param redshift    z from /Header
  */
final case class Cosmology(
    h: Double,
    omega0: Option[Double],
    omegaBaryon: Option[Double],
    redshift: Double) {

  /** Scale factor a = 1/(1+z) — cosmology.py:112-114 (for
    * cosmological runs the Header Time field IS this value, which
    * `Cosmology.isCosmological` uses as its consistency check). */
  def scaleFactor: Double = 1.0 / (1.0 + redshift)

  /** Comoving → physical length factor: x_phys = x_com · a / h
    * (the standard Gadget convention scida's unit registry encodes by
    * defining `a` and `h` as units, cosmology.py:57-63). */
  def comovingToPhysical: Double = scaleFactor / h

  /** scida CosmologyMixin._info_custom analogue. */
  def infoLines: Seq[String] = Seq(
    "=== Cosmological Simulation ===",
    f"z = $redshift%.2f",
    s"h = $h" + omega0.map(o => s", Omega0 = $o").getOrElse("") +
      omegaBaryon.map(o => s", OmegaBaryon = $o").getOrElse(""),
    "===============================")
}

object Cosmology {

  /** First element of array-valued attributes, scalars unchanged —
    * scida misc.get_scalar. */
  private def scalar(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case a: Array[Double] if a.nonEmpty => Some(a.head)
    case a: Array[Float] if a.nonEmpty => Some(a.head.toDouble)
    case a: Array[Long] if a.nonEmpty => Some(a.head.toDouble)
    case _ => None
  }

  private def attr(attrs: Map[String, Map[String, Any]],
      group: String, name: String): Option[Double] =
    attrs.get(group).flatMap(_.get(name)).flatMap(scalar)

  /** z from /Header Redshift — cosmology.py:135. */
  def redshiftFromAttrs(attrs: Map[String, Map[String, Any]]): Option[Double] =
    attr(attrs, "/Header", "Redshift")

  /** Gadget-style parameter lookup with scida's alias order
    * (cosmology.py:160 `get_cosmology_from_rawmetadata`): each of
    * h/Ω₀/Ω_b is searched under /Parameters then /Header, first
    * matching alias wins; rockstar catalogs fall back to root-level
    * `cosmology:*` attributes (cosmology.py:186-192), and
    * FLAMINGO-style SWIFT headers that record Ω_m = -1 recompute it
    * as Ω_cdm + Ω_b from /Parameters (cosmology.py:194-205). Returns
    * None when no Hubble parameter is found anywhere (scida likewise
    * returns no cosmology object). */
  def fromAttrs(attrs: Map[String, Map[String, Any]]): Option[Cosmology] = {
    def find(aliases: Seq[String]): Option[Double] =
      (for {
        grp <- Seq("/Parameters", "/Header").iterator
        name <- aliases.iterator
        v <- attr(attrs, grp, name).iterator
      } yield v).nextOption()
    // rockstar: scalar attrs live on the ROOT object under colon names
    def rockstar(name: String): Option[Double] =
      attr(attrs, "/", s"cosmology:$name")
    val ob0 = find(Seq("OmegaBaryon", "Cosmology:Omega_b"))
      .orElse(rockstar("omega_baryon"))
    val om0raw = find(Seq("Omega0", "Cosmology:Omega_m"))
      .orElse(rockstar("omega_matter"))
    // flamingo-swift: Omega_m is sometimes written as -1.0; then the
    // matter density is Omega_cdm + Omega_b
    val om0 = om0raw match {
      case Some(m) if m <= 0.0 =>
        (attr(attrs, "/Parameters", "Cosmology:Omega_cdm"), ob0) match {
          case (Some(cdm), Some(b)) => Some(cdm + b)
          case _ => om0raw
        }
      case other => other
    }
    for {
      h <- find(Seq("HubbleParam", "Cosmology:h")).orElse(rockstar("hubble"))
      z <- redshiftFromAttrs(attrs)
    } yield Cosmology(h = h, omega0 = om0, omegaBaryon = ob0, redshift = z)
  }

  /** Is this snapshot a cosmological (comoving) run? — the
    * CosmologyMixin.validate logic (cosmology.py:85-130): an explicit
    * /Config ComovingIntegrationOn=1 wins; otherwise "legacy"
    * detection accepts a /Header whose Time is consistent with
    * a = 1/(1+Redshift); a Redshift with no Time at all also counts. */
  def isCosmological(attrs: Map[String, Map[String, Any]]): Boolean = {
    val explicit = attr(attrs, "/Config", "ComovingIntegrationOn").contains(1.0)
    lazy val header = attrs.getOrElse("/Header", Map.empty)
    lazy val legacy = (attr(attrs, "/Header", "Time"), redshiftFromAttrs(attrs)) match {
      case (Some(t), Some(z)) => math.abs(t - 1.0 / (1.0 + z)) <= 1e-8 * math.abs(t)
      case (None, Some(_)) => !header.contains("Time")
      case _ => false
    }
    explicit || legacy
  }
}
