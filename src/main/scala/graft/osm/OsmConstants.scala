package graft.osm

/** The reference's cleaning rulebook, verbatim (clean_and_write.py:9-63,
  * 146-165). Pure data — every map/list the rule-driven typing and
  * renaming derives from.
  */
object OsmConstants {

  /** clean_and_write.py:9 — target phone format (fullmatch). */
  val PhoneRe = "\\+1-\\d{3}-\\d{3}-\\d{4}"

  /** clean_and_write.py:14 — keys containing any of these are dropped. */
  val ProblemChars = "[=+/&<>;'\"?%#$@,. \\t\\r\\n]"

  /** clean_and_write.py:22-28. */
  val IsInMap: Map[String, Seq[String]] = Map(
    "is_in" -> Seq("USA", "WA", "Whatcom County", "Bellingham"),
    "is_in:country" -> Seq("USA"),
    "is_in:country_code" -> Seq("US"),
    "is_in:county" -> Seq("Whatcom"),
    "is_in:iso_3166_2" -> Seq("US:WA"),
    "is_in:state" -> Seq("WA"),
    "is_in:state_code" -> Seq("WA"))

  /** clean_and_write.py:30. */
  val CreatedLst = Seq("version", "changeset", "timestamp", "user", "uid")

  /** clean_and_write.py:34-39. */
  val StreetTypeMap: Map[String, String] = Map(
    "Ave" -> "Avenue", "Ave." -> "Avenue", "Blvd" -> "Boulevard",
    "Bakerview" -> "Bakerview Road", "Count" -> "Court", "Dr" -> "Drive",
    "Forest" -> "Forest Street", "Hwy" -> "Highway",
    "Meridian" -> "Meridian Road", "Pkwy" -> "Parkway", "Rd" -> "Road",
    "Rd." -> "Road", "Road3" -> "Road", "St" -> "Street", "St." -> "Street",
    "Street," -> "Street", "Street\\" -> "Street", "street" -> "Street")

  /** clean_and_write.py:42-45. */
  val WrongKeyMap: Map[String, String] = Map(
    "image" -> "wikimedia_commons",
    "maxspeed:type" -> "source:maxspeed",
    "reg_name" -> "name",
    "social_centre:for" -> "social_facility:for",
    "symbol" -> "wiki:symbol")

  /** clean_and_write.py:48. */
  val BoolTags = Seq("fuel", "payment")

  /** clean_and_write.py:51-54. */
  val ToIntKeys = Seq("ele", "population", "quantity", "faces", "seats",
    "screen", "lanes", "max_level", "min_level", "cables", "beds",
    "changing_table:count", "hoops", "disabled_spaces", "par", "step_count",
    "handicap")

  /** clean_and_write.py:57-58. */
  val ToFloatKeys = Seq("roof:levels", "level", "building:levels:underground",
    "levels", "roof:height", "maxheight", "building:levels")

  /** clean_and_write.py:60-61. */
  val SubdivideKeys = Seq("addr", "cost", "fire_hydrant", "fuel", "payment",
    "service", "wiki")

  /** clean_and_write.py:146-165 — the 41 keys whose values are
    * `;`-separated lists. */
  val ListKeys = Seq("alt_name", "animal_boarding", "amenity", "artist_name",
    "bicycle:conditional", "building", "clothes", "cuisine", "destination",
    "destination:ref", "destination:ref:backward",
    "destination:symbol:backward", "destination:symbol:forward", "direction",
    "fax", "int_name", "name", "loc_name", "material", "maxweight",
    "maxweight:conditional", "motor_vehicle:conditional", "name_alt",
    "old_name", "old_railway_operator", "old_ref", "opening", "opening_hours",
    "phone", "postal_code", "seasonal", "shop", "short_name", "source",
    "sport", "turn", "turn:backward", "turn:forward", "turn:lanes",
    "turn:lanes:backward", "turn:lanes:forward", "website")

  /** clean_and_write.py:16-20 (tiger/gnis/nist namespaces bypass
    * cleaning). */
  val PassthroughNamespaces = Seq("tiger", "gnis", "nist")
}
