package graft.api

import java.io.Writer

import graft.oai.{OaiIdentifier, ResumptionToken}

/** An OAI protocol error rendered as `<error code="…">` (OaiException.java). */
final case class OaiException(code: String, message: String)
    extends RuntimeException(message)

/** The OAI-PMH verb dispatcher (OaiService.java:96-122): one entry point
  * that routes Identify / ListRecords / ListIdentifiers / GetRecord and
  * renders protocol errors (badVerb, badArgument, badResumptionToken,
  * cannotDisseminateFormat, idDoesNotExist) in-band, exactly like the
  * reference's GET /reservoir/oai. `params` are the request's query
  * parameters; the response XML is streamed to `out`.
  */
object OaiEndpoint {

  def handle(res: Reservoir, params: Map[String, String], out: Writer): Unit = {
    val cfg = res.oaiConfig()
    val baseUrl = cfg.map(_._2).getOrElse("baseURL unspecified")
    val repoName = cfg.map(_._1).getOrElse("repositoryName unspecified")
    try {
      val verb = params.getOrElse("verb",
        throw OaiException("badVerb", "missing verb"))
      params.get("metadataPrefix").foreach(p =>
        if (p != "marcxml") throw OaiException("cannotDisseminateFormat",
          "only metadataPrefix \"marcxml\" supported"))
      verb match {
        case "Identify" =>
          Render.oaiIdentify(baseUrl, repoName, out)

        case "ListRecords" | "ListIdentifiers" =>
          val token = params.get("resumptionToken")
          val decoded = token.map { t =>
            try ResumptionToken.decode(t)
            catch { case _: Exception =>
              throw OaiException("badResumptionToken", t)
            }
          }
          val set = decoded.map(_.set).orElse(params.get("set"))
            .getOrElse(throw OaiException("badArgument", "missing set"))
          if (!res.matchKeyConfigs().exists(_.id == set))
            throw OaiException("badArgument", s"set \"$set\" not found")
          val page =
            try res.listRecords(set, from = params.get("from"),
              until = params.get("until"), resumptionToken = token,
              withMetadata = verb == "ListRecords")
            catch {
              // malformed from/until datestamps (Util.parseFrom →
              // OaiException.badArgument in the reference)
              case e: java.time.format.DateTimeParseException =>
                throw OaiException("badArgument", e.getMessage)
              case e: IllegalArgumentException =>
                throw OaiException("badArgument", e.getMessage)
            }
          Render.oaiList(page, verb, baseUrl, set, out)

        case "GetRecord" =>
          val identifier = params.getOrElse("identifier",
            throw OaiException("badArgument", "missing identifier"))
          val clusterId =
            try OaiIdentifier.decode(identifier)
            catch { case _: Exception =>
              throw OaiException("badArgument", s"bad identifier: $identifier")
            }
          // cluster ids are globally unique; search each pool's meta
          val item = res.matchKeyConfigs().view
            .flatMap(c => res.getOaiRecord(c.id, clusterId)).headOption
          if (item.isEmpty) throw OaiException("idDoesNotExist", identifier)
          Render.oaiGetRecord(item, baseUrl, out)

        case other =>
          throw OaiException("badVerb", other)
      }
    } catch {
      case OaiException(code, msg) => Render.oaiError(code, msg, baseUrl, out)
    }
  }
}
