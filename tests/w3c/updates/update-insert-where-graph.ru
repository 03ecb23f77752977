INSERT { GRAPH <urn:g3> { ?s <urn:p2> ?o } } WHERE { GRAPH <urn:g1> { ?s <urn:p> ?o } }
