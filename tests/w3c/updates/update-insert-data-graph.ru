INSERT DATA { GRAPH <urn:gNew> { <urn:sx> <urn:p> "fresh" } }
