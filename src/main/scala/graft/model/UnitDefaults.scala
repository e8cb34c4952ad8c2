package graft.model

/** Per-simulation-family default field units — the graft analogue of
  * scida's shipped unit config files (reference:
  * src/scida/configfiles/units/gadget_cosmological.yaml,
  * eagle.yaml, resolved through interfaces/mixins/units.py:411
  * `add_units`: per-group field entry first, then the `_all`
  * fallback). The flagship public datasets (TNG/Illustris, EAGLE)
  * write NO unit attributes on their datasets, so without this table
  * they load unitless; scida fills the gap from YAML keyed by the
  * dataset family, graft from this table keyed by `Load.flavor`.
  *
  * Entries are unit EXPRESSIONS in the reference's code-unit
  * vocabulary (gadget_cosmological.yaml:1-15): `code_length` =
  * ckpc/h, `ckpc` = a·kpc, `code_mass` = 1e10·Msun/h,
  * `code_velocity` = km/s, `code_time` = kpc/(km/s), plus bare `a`
  * and `h` factors (fractional exponents allowed — Velocities carry
  * a^0.5). Resolution folds a and h in NUMERICALLY from the
  * snapshot's cosmology — the same treatment `UnitAttrs` gives
  * TNG-style `a_scaling`/`h_scaling` attrs — so the result is
  * (factor, Measure): raw × factor is a value in the symbolic
  * physical measure. Expressions with a/h terms are unresolvable
  * without a cosmology and return None (unreported beats wrong).
  *
  * Precedence: graft applies defaults only where file attributes
  * resolve nothing (`Load.dataset`); an attr-carrying field keeps its
  * attr-derived unit. (scida additionally supports unit-file
  * `override: true` entries that beat known-wrong metadata,
  * gadget_cosmological.yaml GFM_AGNRadiation — not modeled here.)
  */
object UnitDefaults {

  /** Gadget-family cosmological defaults — a representative subset of
    * gadget_cosmological.yaml `fields:` (the TNG/Illustris/MTNG
    * convention; yaml lines cited per group). */
  private val Gadget: Map[String, Map[String, String]] = Map(
    // _all (yaml "fields: _all:"): fields every particle type carries
    "_all" -> Map(
      "Coordinates" -> "code_length",
      "Masses" -> "code_mass",
      "Velocities" -> "km*a^0.5/s",
      "Potential" -> "km^2/s^2/a",
      "SubfindDensity" -> "code_mass/code_length^3",
      "SubfindHsml" -> "code_length",
      "SubfindVelDisp" -> "km/s",
      "StarFormationRate" -> "Msun/yr"),
    "PartType0" -> Map(
      "CenterOfMass" -> "code_length",
      "Density" -> "code_mass/code_length^3",
      "InternalEnergy" -> "km^2/s^2",
      "SmoothingLength" -> "code_length",
      "Temperature" -> "K",
      "Volume" -> "code_length^3"),
    "PartType4" -> Map(
      "BirthPos" -> "code_length",
      "BirthVel" -> "a^0.5*km/s",
      "GFM_InitialMass" -> "code_mass",
      "StellarHsml" -> "code_length"),
    "PartType5" -> Map(
      "BH_Density" -> "code_mass/code_length^3",
      "BH_Hsml" -> "code_length",
      "BH_Mass" -> "code_mass",
      "BH_Mdot" -> "code_mass*h/code_time",
      "BH_U" -> "km^2/s^2"),
    // group catalogs carry no metadata attrs at all (yaml comment
    // "no metadata attributes in group catalogs")
    "Group" -> Map(
      "GroupBHMass" -> "code_mass",
      "GroupCM" -> "code_length",
      "GroupMass" -> "code_mass",
      "GroupPos" -> "code_length",
      "GroupSFR" -> "Msun/yr",
      "GroupVel" -> "km/s/a",
      "Group_M_Crit200" -> "code_mass",
      "Group_R_Crit200" -> "code_length"),
    "Subhalo" -> Map(
      "SubhaloCM" -> "code_length",
      "SubhaloHalfmassRad" -> "code_length",
      "SubhaloMass" -> "code_mass",
      "SubhaloPos" -> "code_length",
      "SubhaloSFR" -> "Msun/yr",
      "SubhaloSpin" -> "kpc*km/s/h",
      "SubhaloVel" -> "km/s",
      "SubhaloVelDisp" -> "km/s",
      "SubhaloVmax" -> "km/s",
      "SubhaloVmaxRad" -> "code_length"))

  /** MTNG overrides on the Gadget base (configfiles/units/mtng.yaml
    * layered over gadget_cosmological.yaml — "later unit file takes
    * precedence", customs/arepo/MTNG/dataset.py:55): coordinates ship
    * as cMpc/h, NOT code_length=ckpc/h, despite what the cgs-factor
    * attrs would say (mtng.yaml's own comment). Per-PartType entries,
    * not `_all`, exactly as the yaml spells them ("explicit overwrite
    * needed"). */
  private val Mtng: Map[String, Map[String, String]] = {
    val overrides = Map(
      "PartType0" -> Map(
        "Coordinates" -> "cMpc/h", "CenterOfMass" -> "cMpc/h"),
      "PartType1" -> Map("Coordinates" -> "cMpc/h"),
      "PartType4" -> Map("Coordinates" -> "cMpc/h"))
    (Gadget.keySet ++ overrides.keySet).map(g =>
      g -> (Gadget.getOrElse(g, Map.empty) ++
        overrides.getOrElse(g, Map.empty))).toMap
  }

  /** EAGLE ships cgs unit strings per field (eagle.yaml `cgsunits`);
    * here as plain measures — factor 1, raw values already cgs. */
  private val Eagle: Map[String, Map[String, String]] = Map(
    "_all" -> Map(
      "Coordinates" -> "cm",
      "Velocity" -> "cm/s",
      "Mass" -> "g"),
    "PartType0" -> Map(
      "Density" -> "g/cm^3",
      "InternalEnergy" -> "cm^2/s^2",
      "SmoothingLength" -> "cm",
      "StarFormationRate" -> "g/s",
      "Temperature" -> "K"),
    "PartType4" -> Map(
      "BirthDensity" -> "g/cm^3"))

  /** Auriga overrides on the Gadget base (configfiles/units/
    * auriga.yaml layered over gadget_cosmological.yaml via the
    * simulations.yaml entry's `unitfile: [gadget_cosmological,
    * auriga]` list — later file wins): Auriga snapshots ship values
    * already in physical-ish units (Coordinates Mpc, Masses
    * 10^10 Msun, Velocities km/s — no a/h factors), so the overrides
    * are factor-1 labels or bare 1e10 scalings; anything the yaml
    * doesn't name keeps the Gadget code-unit default. */
  private val Auriga: Map[String, Map[String, String]] = {
    val overrides = Map(
      "_all" -> Map(
        "Coordinates" -> "Mpc",
        "Masses" -> "1e10*Msun",
        "Velocities" -> "km/s",
        "Softenings" -> "Mpc"),
      "PartType0" -> Map("HighResGasMass" -> "1e10*Msun"),
      "PartType4" -> Map(
        "BirthPos" -> "Mpc",
        "BirthVel" -> "km/s",
        "GFM_StellarFormationTime" -> "Gyr",
        "GravForce" -> "km/s^2/Mpc",
        "GravPotential" -> "km^2/s^2"),
      "PartType5" -> Map(
        "BH_HaloVvir" -> "km/s",
        "BH_HsmlDM" -> "Mpc",
        "BH_Mdot_Quasar" -> "Msun/yr",
        "BH_Mdot_Radio" -> "Msun/yr",
        "BH_VelDM" -> "km/s"))
    (Gadget.keySet ++ overrides.keySet).map(g =>
      g -> (Gadget.getOrElse(g, Map.empty) ++
        overrides.getOrElse(g, Map.empty))).toMap
  }

  /** FLAMINGO (configfiles/units/flamingo.yaml): a SWIFT run — every
    * dataset self-describes its units through the SWIFT cgs-factor
    * attrs UnitAttrs resolves, so the yaml ships NO field units (only
    * `no_units` markers for the Cells/Header/SubgridScheme metadata
    * containers, which graft never unit-resolves anyway). The shipped
    * entry exists so the FLAMINGO identification hook
    * (simulations.yaml:162 `Snapshots:basename == "flamingo"`)
    * resolves to a known family rather than an unknown flavor. */
  private val Flamingo: Map[String, Map[String, String]] = Map.empty

  /** L-Galaxies semi-analytic catalogs (configfiles/units/
    * lgalaxies.yaml): ONE `Galaxy` table whose code-unit system fixes
    * h = 0.673 IN THE UNIT FILE (the Millennium-run value — LGalaxies
    * outputs carry no usable Hubble header), while `a` still folds
    * from the snapshot. The macros below are the yaml's `units:`
    * block verbatim; fields are a representative subset of its 100+
    * Galaxy entries covering every macro. */
  private val LGalaxiesMacros: Map[String, String] = Map(
    "h" -> "0.673",
    "code_length" -> "ckpc/h",
    "code_velocity" -> "km/s",
    "code_mass" -> "1e10*Msun/h",
    "code_time" -> "0.978*Gyr",
    "code_pressure" -> "code_mass/code_length/code_time^2",
    "code_Mdot" -> "Msun/yr",
    "code_time_yr" -> "yr",
    "code_time_Gyr" -> "1e9*yr")

  private val LGalaxies: Map[String, Map[String, String]] = Map(
    "Galaxy" -> Map(
      "BulgeSize" -> "code_length",
      "Central_M_Crit200" -> "code_mass",
      "Central_R_Crit200" -> "code_length",
      "ColdGasMass" -> "code_mass",
      "CoolingRadius" -> "code_length",
      "CoolingRate" -> "code_Mdot",
      "CosInclination" -> "deg",
      "DistanceToCentralGal" -> "code_length",
      "EjectedMass" -> "code_mass",
      "GasDiskRadius" -> "code_length",
      "HaloSpin" -> "code_length*code_velocity",
      "HaloStellarMass" -> "code_mass",
      "HotGasMass" -> "code_mass",
      "HotGasRadius" -> "code_length",
      "InfallVmax" -> "code_velocity",
      "LookBackTimeToSnap" -> "code_time_yr",
      "M_Crit200" -> "code_mass",
      "MassWeightAge" -> "code_time_Gyr",
      "MergTime" -> "code_time",
      "Pos" -> "code_length",
      "QuasarAccretionRate" -> "code_Mdot",
      "R_Crit200" -> "code_length",
      "StarFormationRate" -> "code_Mdot",
      "StellarBulgeMass" -> "code_mass",
      "StellarDiskMass" -> "code_mass",
      "StellarDiskRadius" -> "code_length",
      "StellarHalfMassRadius" -> "code_length",
      "StellarMass" -> "code_mass",
      "Vel" -> "code_velocity",
      "Vmax" -> "code_velocity",
      "Vvir" -> "code_velocity",
      "BlackHoleMass" -> "code_mass",
      "ColdGas_elements" -> "Msun",
      "HotGas_elements" -> "Msun",
      "StellarMassFromBursts" -> "code_mass",
      "rho_LBE_Gas" -> "code_mass/code_length^3",
      "rho_LBE_Total" -> "code_mass/code_length^3"))

  /** Gaia DR3 source catalogs (configfiles/units/gaia.yaml): a flat
    * astrometric table — positions deg, parallaxes/position errors
    * mas, proper motions mas/yr, photometry mag, metallicity dex,
    * GSP-Phot distances pc, radial velocities km/s. All factor-1
    * physical labels (metadata_unitsystem: code). */
  private val Gaia: Map[String, Map[String, String]] = Map(
    "_all" -> Map(
      "ra" -> "deg", "dec" -> "deg", "l" -> "deg", "b" -> "deg",
      "ra_error" -> "mas", "dec_error" -> "mas",
      "parallax" -> "mas", "parallax_error" -> "mas",
      "pmra" -> "mas/yr", "pmra_error" -> "mas/yr",
      "pmdec" -> "mas/yr", "pmdec_error" -> "mas/yr",
      "radial_velocity" -> "km/s", "radial_velocity_error" -> "km/s",
      "distance_gspphot" -> "pc",
      "distance_gspphot_lower" -> "pc",
      "distance_gspphot_upper" -> "pc",
      "mh_gspphot" -> "dex",
      "mh_gspphot_lower" -> "dex", "mh_gspphot_upper" -> "dex",
      "phot_g_mean_mag" -> "mag", "phot_bp_mean_mag" -> "mag",
      "phot_rp_mean_mag" -> "mag",
      "phot_g_mean_flux_error" -> "1/s",
      "phot_bp_mean_flux_error" -> "1/s",
      "phot_rp_mean_flux_error" -> "1/s"))

  /** eROSITA X-ray event lists (configfiles/units/
    * erosita_events.yaml): sky positions deg, detector coordinates
    * arcsec, times s, calibrated photon energy PI in eV, raw pulse
    * height PHA in adu (the yaml leaves the adu→energy conversion
    * undefined; so does graft — adu is its own dimension). */
  private val Erosita: Map[String, Map[String, String]] = Map(
    "_all" -> Map(
      "RA" -> "deg", "DEC" -> "deg",
      "X" -> "arcsec", "Y" -> "arcsec",
      "TIME" -> "s", "FRAMETIME" -> "s", "RECORDTIME" -> "s",
      "PI" -> "eV", "PHA" -> "adu"))

  /** Rockstar halo catalogs (configfiles/units/rockstar.yaml, quoting
    * the Rockstar source's own unit banner): masses Msun/h, positions
    * cMpc/h, halo lengths/radii ckpc/h, velocities physical km/s.
    * Spins are dimensionless (no entry → unitless, correct). */
  private val Rockstar: Map[String, Map[String, String]] = Map(
    "_all" -> Map(
      "mass" -> "rockstar_mass",
      "mass.vir" -> "rockstar_mass",
      "mass.200c" -> "rockstar_mass",
      "mass.200m" -> "rockstar_mass",
      "mass.500c" -> "rockstar_mass",
      "mass.bound" -> "rockstar_mass",
      "mass.peak" -> "rockstar_mass",
      "mass.lowres" -> "rockstar_mass",
      "infall.first.mass" -> "rockstar_mass",
      "position" -> "cMpc/h",
      "position.offset" -> "cMpc/h",
      "radius" -> "rockstar_length",
      "scale.radius" -> "rockstar_length",
      "scale.radius.klypin" -> "rockstar_length",
      "host.distance" -> "rockstar_length",
      "velocity" -> "rockstar_velocity",
      "velocity.offset" -> "rockstar_velocity",
      "host.velocity" -> "rockstar_velocity",
      "host.velocity.rad" -> "rockstar_velocity",
      "host.velocity.tan" -> "rockstar_velocity",
      "vel.circ.max" -> "rockstar_velocity",
      "vel.circ.peak" -> "rockstar_velocity",
      "vel.std" -> "rockstar_velocity",
      "infall.first.vel.circ.max" -> "rockstar_velocity"))

  /** flavor (Load.flavor's vocabulary) → group → field → expr.
    * gizmo shares the Gadget code-unit convention
    * (configfiles/units/gizmo.yaml mirrors gadget_cosmological).
    * SWIFT has NO defaults table by design: SWIFT snapshots
    * self-describe every dataset ("Expression for physical CGS
    * units" attrs, handled by UnitAttrs) — which is why scida ships
    * no swift.yaml either. */
  private val tables: Map[String, Map[String, Map[String, String]]] = Map(
    "arepo" -> Gadget,
    "gizmo" -> Gadget,
    "mtng" -> Mtng,
    "eagle" -> Eagle,
    "rockstar" -> Rockstar,
    "auriga" -> Auriga,
    "flamingo" -> Flamingo,
    "lgalaxies" -> LGalaxies,
    "gaia" -> Gaia,
    "erosita" -> Erosita)

  /** Per-flavor macro definitions layered over the builtin code-unit
    * vocabulary (a family's yaml `units:` block) — consulted by
    * `eval` BEFORE the builtin `prim` table, so a family can pin its
    * own `h` (lgalaxies.yaml fixes h = 0.673) or redefine a code_*
    * macro without touching the shared convention. */
  private val macroTables: Map[String, Map[String, String]] = Map(
    "lgalaxies" -> LGalaxiesMacros)

  // ---- User-extensible registry — scida get_simulationconfig
  // (config.py:148): the user's ~/.config/scida/simulations.yaml
  // layers over the shipped simulations.yaml ("later entry takes
  // precedence"), mapping simulations to unit files. graft reads the
  // same shape from the one JSON registry Load.findPath already uses
  // (GRAFT_CONFIG_PATH / `graft.config.path` property /
  // ~/.config/graft/config.json), under a top-level "units" key:
  //
  //   { "units": { "<flavor>": { "_all":      {"Masses": "code_mass"},
  //                              "PartType0": {"Coordinates": "cMpc/h"} } } }
  //
  // A user flavor entry merges field-by-field OVER the shipped table
  // (the reference's leaf-level dict merge, config.py:69
  // merge_dicts_recursively with later-wins), so users can both
  // override single fields of a shipped family and define entirely
  // new families — no hardcode. Parsed config is memoized per
  // (path, mtime, size); unreadable/absent files contribute nothing.

  private val userCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Map[String, Map[String, Map[String, String]]]]()

  def configPath: String =
    sys.props.getOrElse("graft.config.path",
      sys.env.getOrElse("GRAFT_CONFIG_PATH",
        sys.props("user.home") + "/.config/graft/config.json"))

  private def userTables(path: String): Map[String, Map[String, Map[String, String]]] = {
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    val key = (f.getCanonicalPath, f.lastModified(), f.length())
    userCache.computeIfAbsent(key, _ =>
      try {
        val cfg = graft.sources.zarr.MiniJson
          .parse(java.nio.file.Files.readString(f.toPath))
          .asInstanceOf[Map[String, Any]]
        cfg.get("units") match {
          case Some(u: Map[String @unchecked, Any @unchecked]) =>
            u.collect { case (flavor, g: Map[String @unchecked, Any @unchecked]) =>
              flavor -> g.collect {
                case (group, fs: Map[String @unchecked, Any @unchecked]) =>
                  group -> fs.collect { case (k, v: String) => k -> v }
              }
            }
          case _ => Map.empty[String, Map[String, Map[String, String]]]
        }
      } catch { case _: Exception =>
        Map.empty[String, Map[String, Map[String, String]]] })
  }

  /** The effective (shipped ⊕ user) table for a flavor: user entries
    * win field-by-field; a flavor only the user defines is fully
    * user-owned. */
  private def mergedTable(flavor: String): Option[Map[String, Map[String, String]]] = {
    val shipped = tables.get(flavor)
    val user = userTables(configPath).get(flavor)
    if (shipped.isEmpty && user.isEmpty) None
    else {
      val groups = shipped.map(_.keySet).getOrElse(Set.empty) ++
        user.map(_.keySet).getOrElse(Set.empty)
      Some(groups.map(g =>
        g -> (shipped.flatMap(_.get(g)).getOrElse(Map.empty) ++
          user.flatMap(_.get(g)).getOrElse(Map.empty))).toMap)
    }
  }

  /** The symbolic default expression for (flavor, group, field):
    * group-specific entry first, then `_all` (units.py:466-470), over
    * the user-extended table. */
  def unitString(flavor: String, group: String, field: String): Option[String] =
    mergedTable(flavor).flatMap { t =>
      t.get(group).flatMap(_.get(field))
        .orElse(t.getOrElse("_all", Map.empty).get(field))
    }

  /** Resolve (flavor, group, field) to (factor, physical measure):
    * raw × factor is a value in the measure. None when no default
    * exists or the expression needs a cosmology that isn't there. */
  def resolve(flavor: String, group: String, field: String,
      cosmo: Option[Cosmology]): Option[(Double, Units.Measure)] =
    unitString(flavor, group, field)
      .flatMap(eval(_, cosmo, macroTables.getOrElse(flavor, Map.empty)))

  /** Evaluate a code-unit expression to (factor, Measure). Grammar is
    * `term (('*'|'/') term)*`, term = `sym['^'exp]`; exp is a decimal
    * (fractional only on purely numeric symbols — a, h, literals).
    * `macros` are flavor-local symbol definitions resolved
    * recursively ahead of the builtin vocabulary. */
  def eval(expr: String, cosmo: Option[Cosmology],
      macros: Map[String, String] = Map.empty,
      depth: Int = 0): Option[(Double, Units.Measure)] = {
    require(depth < 16, s"unit macro recursion too deep at '$expr'")
    var factor = 1.0
    var measure = Units.dimensionless
    val tokens = expr.trim.split("(?=[*/])").toSeq
    for (tok0 <- tokens) {
      val (sign, tok) =
        if (tok0.startsWith("*")) (1, tok0.tail)
        else if (tok0.startsWith("/")) (-1, tok0.tail)
        else (1, tok0)
      val (sym, exp) = tok.split('^') match {
        case Array(y) => (y.trim, 1.0)
        case Array(y, e) => (y.trim, e.trim.toDouble)
        case _ => throw new IllegalArgumentException(
          s"cannot parse unit term '$tok' in '$expr'")
      }
      val e = sign * exp
      val resolved = macros.get(sym) match {
        case Some(defn) => eval(defn, cosmo, macros, depth + 1)
        case None => prim(sym, cosmo)
      }
      resolved match {
        case None => return None // needs cosmology we don't have
        case Some((f, m)) =>
          factor *= math.pow(f, e)
          if (m.syms.nonEmpty) {
            require(e == e.floor,
              s"fractional exponent $e on dimensionful '$sym' in '$expr'")
            measure = measure * m.pow(e.toInt)
          }
      }
    }
    Some((factor, measure))
  }

  /** One symbol → (factor, measure). Code-unit macros per
    * gadget_cosmological.yaml:1-15; a/h are the cosmology's numeric
    * values (cosmology.py:57-63 registers them as registry units);
    * everything else must be a registered physical unit. */
  private def prim(sym: String,
      cosmo: Option[Cosmology]): Option[(Double, Units.Measure)] = sym match {
    case "a" => cosmo.map(c => (c.scaleFactor, Units.dimensionless))
    case "h" => cosmo.map(c => (c.h, Units.dimensionless))
    case "ckpc" => cosmo.map(c => (c.scaleFactor, Units.parse("kpc")))
    case "cMpc" => cosmo.map(c => (c.scaleFactor, Units.parse("Mpc")))
    // rockstar.yaml units: block (masses Msun/h, lengths ckpc/h,
    // velocities physical km/s)
    case "rockstar_mass" => cosmo.map(c => (1.0 / c.h, Units.parse("Msun")))
    case "rockstar_length" => cosmo.map(c => (c.scaleFactor / c.h, Units.parse("kpc")))
    case "rockstar_velocity" => Some((1.0, Units.parse("km/s")))
    case "code_length" => cosmo.map(c => (c.scaleFactor / c.h, Units.parse("kpc")))
    case "code_mass" => cosmo.map(c => (1e10 / c.h, Units.parse("Msun")))
    case "code_velocity" => Some((1.0, Units.parse("km/s")))
    case "code_time" => Some((1.0, Units.parse("kpc*s/km")))
    case s if s.nonEmpty && (s.head.isDigit || s.head == '.') =>
      Some((s.toDouble, Units.dimensionless))
    case s => Some((1.0, Units.parse(s))) // throws on unknown symbols
  }
}
