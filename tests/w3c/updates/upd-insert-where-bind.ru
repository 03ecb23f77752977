INSERT { ?s <urn:double> ?d } WHERE { ?s <urn:age> ?a BIND(?a*2 AS ?d) }
