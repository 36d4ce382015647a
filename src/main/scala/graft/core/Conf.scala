package graft.core

/** Engine configuration constants — the semantics of the reference's
  * config.yaml (code-type allowlist :20-27, normalization map :29-37,
  * modifier glossary :39-46) plus the enricher's stoplist
  * (hospital_enricher.py:37).
  */
object Conf {

  /** Allowed billing-code types (config.yaml:20-27). */
  val AllowedCodeTypes: Seq[String] = Seq("CPT", "HCPCS", "ICD", "DRG", "CDT", "NDC", "APC")

  /** Raw→canonical code-type normalization (config.yaml:29-37). */
  val CodeTypeNormalization: Map[String, String] = Map(
    "CPT" -> "CPT", "HCPCS" -> "HCPCS", "ICD" -> "ICD",
    "MS-DRG" -> "DRG", "DRG" -> "DRG", "CDT" -> "CDT",
    "NDC" -> "NDC", "APC" -> "APC")

  /** Billing-modifier glossary (config.yaml:39-46). */
  val ModifierGlossary: Map[String, String] = Map(
    "22" -> "Increased procedural service",
    "26" -> "Professional component only",
    "TC" -> "Technical component only",
    "59" -> "Distinct procedural service",
    "76" -> "Repeat procedure by same provider",
    "JW" -> "Drug amount discarded/not administered to any patient")

  /** Generic words stripped when deriving campus_id from a hospital name
    * (hospital_enricher.py:37). NOTE: the reference lists "INC" uppercase but
    * lowercases the name first, so "INC" never matches — preserved verbatim
    * because the derived keys are the join contract. */
  val GenericWords: Seq[String] = Seq("hospital", "medical", "center", "campus",
    "health", "system", "of", "corporation", "general", "university", "s",
    "regional", "INC")

  /** Cleaning-rule names, in evaluation order (cleaning_utils.py:21-54). */
  val RuleNames: Seq[String] = (1 to 10).map(i => s"rule_$i")
}
