DROP GRAPH <urn:g1>
